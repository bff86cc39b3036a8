"""Flash attention (ops/flash.py) vs the einsum oracle.

Runs the stock Pallas TPU flash kernel under the TPU interpreter on CPU
(pltpu.force_tpu_interpret_mode inside flash_mha) and checks forward and
gradient parity against models/vit.py's default einsum attention — the
exact math the flag replaces. Covers the padding seam (T not a multiple of
128: ViT-B/16's T=197 case) and the causal mask (text family).

Every flash call here sits under an outer jax.jit: repeated EAGER dispatch
of the interpreted kernel deadlocks in this jax build (ops/flash.py module
docstring) — and production paths are always jitted anyway, so jitted
parity is the contract that matters.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.ops.flash import flash_mha


def _oracle(q, k, v, causal=False):
    """The einsum path from models/vit.py attention(), params factored out."""
    t = q.shape[1]
    scores = jnp.einsum("nthd,nshd->nhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / q.shape[-1] ** 0.5)
    if causal:
        tri = jnp.tril(jnp.ones((t, t), jnp.bool_))
        scores = jnp.where(tri, scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("nhts,nshd->nthd", att, v,
                      preferred_element_type=q.dtype)


def _qkv(n, t, h, hd, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(n, t, h, hd).astype(np.float32),
                             dtype=dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("t,causal", [
    (128, False),   # aligned, no padding path
    (70, False),    # padded 70 -> 128: the SegmentIds masking seam
    (70, True),     # causal + padding (text family shape class)
])
def test_forward_matches_einsum(t, causal):
    q, k, v = _qkv(2, t, 2, 64)
    got = jax.jit(functools.partial(flash_mha, causal=causal))(q, k, v)
    want = _oracle(q, k, v, causal=causal)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-3, atol=2e-3)


def test_grads_match_einsum():
    # padded T exercises the claim that pad-region grads are exactly zero
    # and sliced off: the visible grads must match the oracle's.
    q, k, v = _qkv(1, 70, 2, 64, seed=1)

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v) ** 2).sum()

    def loss_oracle(q, k, v):
        return (_oracle(q, k, v) ** 2).sum()

    # the custom-VJP bwd kernel is linearized OUTSIDE flash_mha's own
    # interpret-mode scope, so the whole grad trace needs the context
    # (ops/flash.py docstring: CPU grads require the caller to wrap)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.array(got), np.array(want),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"d{name}")


def test_cpu_train_step_with_flash():
    """PRODUCTION CPU training with flash_attention=True must work: the
    custom-VJP backward kernel is linearized outside flash_mha's interpret
    scope, so build_train_step wraps the grad trace itself (ADVICE r4 #1 —
    previously only this test file wrapped it, and the --flash-attention CLI
    flag crashed every CPU/dryrun training run)."""
    from cpg_tpu.train.sequence import init_state, start_task
    from cpg_tpu.train.step import TrainConfig, build_train_step

    from .helpers import synthetic_task, tiny_vit, normalize01

    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32,
                      flash_attention=True)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_vit, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    t = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": t.private})
    opms = opt_pm.init({})
    x = jnp.asarray(data["train_x"][:16])
    y = jnp.asarray(data["train_y"][:16])
    out = jax.jit(step)(state.shared, {}, t.private, t.bn_state, ows,
                        opms, state.ownership, 1, x, y,
                        jax.random.PRNGKey(3), 0)
    loss = float(out[-1]["loss"])
    assert np.isfinite(loss)


def test_vit_forward_flag_parity():
    """The full vit_cifar forward with flash_attention=True stays close to
    the default path (same params, f32): the flag changes the attention
    IMPLEMENTATION, not the model."""
    from cpg_tpu.models import get_model
    from cpg_tpu.models import framework as fw

    model_fn, in_shape = get_model("vit_cifar")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, *in_shape), jnp.float32)
    shared, private, bn = fw.init(rng, model_fn, x, num_classes=5, mult=1.0)

    @jax.jit
    def run_flash(shared, private, bn, x):
        out, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                          num_classes=5, mult=1.0, flash_attention=True)
        return out

    base, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                       num_classes=5, mult=1.0)
    flash = run_flash(shared, private, bn, x)
    np.testing.assert_allclose(np.array(flash), np.array(base),
                               rtol=5e-4, atol=5e-4)
