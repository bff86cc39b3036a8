"""Pallas fused masked matmul vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.ops.binarize import binarize
from cpg_tpu.ops.pallas.masked_matmul import (masked_matmul,
                                              masked_matmul_reference)


def _case(m, k, n, seed=0, tid=3):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    own = jnp.asarray(rng.choice([0, 1, 2, 3, 4], size=(k, n)).astype(np.int8))
    pm = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.01)
    return x, w, own, pm, tid


@pytest.mark.parametrize("shape", [(128, 128, 128), (256, 384, 128),
                                   (64, 100, 50), (8, 515, 37)])
def test_forward_matches_reference(shape):
    x, w, own, pm, tid = _case(*shape)
    got = masked_matmul(x, w, own, pm, tid)
    want = masked_matmul_reference(x, w, own, pm, tid)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4,
                               atol=1e-4)


def test_forward_task1_no_prior():
    x, w, own, pm, _ = _case(64, 128, 128, tid=1)
    got = masked_matmul(x, w, own, pm, 1)
    want = masked_matmul_reference(x, w, own, pm, 1)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4,
                               atol=1e-4)


def test_gradients_match_effective_params_semantics():
    x, w, own, pm, tid = _case(32, 128, 64, seed=1)
    t = jnp.asarray([1.0])

    def loss_pallas(x, w, pm):
        return jnp.sum(masked_matmul(x, w, own, pm, tid) * 0.01)

    def loss_ref(x, w, pm):
        tidv = jnp.asarray(tid, jnp.int32)
        o = own.astype(jnp.int32)
        weff = jnp.where(
            o == tidv, w,
            jnp.where((o > 0) & (o < tidv), binarize(pm) * w, 0.0))
        return jnp.sum(jnp.dot(x, weff) * 0.01)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, pm)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, pm)
    # dx identical
    np.testing.assert_allclose(np.array(gp[0]), np.array(gr[0]), rtol=1e-4,
                               atol=1e-5)
    # dw: pallas pre-gates to own==tid; reference gates in gate_and_decay.
    gr_w_gated = jnp.where(own == tid, gr[1], 0.0)
    np.testing.assert_allclose(np.array(gp[1]), np.array(gr_w_gated),
                               rtol=1e-4, atol=1e-5)
    # dpm: STE grad on prior entries (reference zeroes elsewhere in
    # gate_piggymask_grads)
    gr_pm_gated = jnp.where((own > 0) & (own < tid), gr[2], 0.0)
    np.testing.assert_allclose(np.array(gp[2]), np.array(gr_pm_gated),
                               rtol=1e-4, atol=1e-5)


def test_bf16_inputs():
    x, w, own, pm, tid = _case(128, 256, 128, seed=2)
    xb = x.astype(jnp.bfloat16)
    got = masked_matmul(xb, w, own, pm, tid)
    assert got.dtype == jnp.bfloat16
    want = masked_matmul_reference(xb, w, own, pm, tid)
    np.testing.assert_allclose(
        np.array(got, np.float32), np.array(want, np.float32), rtol=2e-2,
        atol=2e-1)


def test_ternary_mode_forward_and_grads():
    """mask_mode='ternary' (ref Ternarizer): pm>thr picks +w, pm<0 picks -w;
    STE dpm = G*w on prior entries, same as binary."""
    from cpg_tpu.ops.binarize import ternarize

    x, w, own, pm, tid = _case(32, 128, 64, seed=4)
    got = masked_matmul(x, w, own, pm, tid, mask_mode="ternary")
    want = masked_matmul_reference(x, w, own, pm, tid, mask_mode="ternary")
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4,
                               atol=1e-4)
    # ternary picks differ from binary whenever pm < 0 on prior entries
    binary = masked_matmul(x, w, own, pm, tid)
    assert float(jnp.abs(got - binary).max()) > 0.0

    def loss_pallas(x, w, pm):
        return jnp.sum(masked_matmul(x, w, own, pm, tid,
                                     mask_mode="ternary") * 0.01)

    def loss_ref(x, w, pm):
        tidv = jnp.asarray(tid, jnp.int32)
        o = own.astype(jnp.int32)
        weff = jnp.where(
            o == tidv, w,
            jnp.where((o > 0) & (o < tidv), ternarize(pm) * w, 0.0))
        return jnp.sum(jnp.dot(x, weff) * 0.01)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, pm)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, pm)
    np.testing.assert_allclose(np.array(gp[0]), np.array(gr[0]), rtol=1e-4,
                               atol=1e-5)
    gr_w_gated = jnp.where(own == tid, gr[1], 0.0)
    np.testing.assert_allclose(np.array(gp[1]), np.array(gr_w_gated),
                               rtol=1e-4, atol=1e-5)
    gr_pm_gated = jnp.where((own > 0) & (own < tid), gr[2], 0.0)
    np.testing.assert_allclose(np.array(gp[2]), np.array(gr_pm_gated),
                               rtol=1e-4, atol=1e-5)
