"""Fused affine+ReLU+conv3x3 chain kernel (ops/pallas/fused_chain.py).

CPU interpret-mode parity vs the XLA oracle, forward and backward — the
kernel's masking/shift arithmetic and the hand-written transposed-conv
backward must match jax.grad of the materialized-activation reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.ops.pallas.fused_chain import (fused_affine_relu_conv,
                                            fused_oracle, _pick_tb)


def _mk(n, h, w, cin, cout, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (n, h, w, cin), jnp.float32)
    a = jax.random.uniform(ks[1], (cin,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(ks[2], (cin,), jnp.float32) * 0.3
    wt = jax.random.normal(ks[3], (3, 3, cin, cout), jnp.float32) * 0.1
    return x, a, b, wt


@pytest.mark.parametrize("shape", [
    (4, 8, 8, 16, 32),    # multi-image block
    (2, 5, 7, 8, 16),     # non-square, odd spatial (mask edges)
    (3, 4, 4, 24, 8),     # n not a power of two -> tb=1
    (8, 3, 3, 4, 4),      # minimum spatial
])
def test_forward_matches_oracle(shape):
    n, h, w, cin, cout = shape
    x, a, b, wt = _mk(*shape)
    got = fused_affine_relu_conv(x, a, b, wt, jnp.float32)
    want = fused_oracle(x, a, b, wt, jnp.float32)
    assert got.shape == (n, h, w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_bf16_close():
    x, a, b, wt = _mk(4, 8, 8, 16, 16)
    got = fused_affine_relu_conv(x.astype(jnp.bfloat16), a, b, wt)
    want = fused_oracle(x, a, b, wt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.1)


def test_gradients_match_oracle():
    x, a, b, wt = _mk(2, 6, 6, 8, 12, seed=3)
    g_ref = jax.random.normal(jax.random.PRNGKey(9), (2, 6, 6, 12))

    def loss_fused(x, a, b, wt):
        return jnp.sum(fused_affine_relu_conv(x, a, b, wt, jnp.float32)
                       * g_ref)

    def loss_oracle(x, a, b, wt):
        return jnp.sum(fused_oracle(x, a, b, wt, jnp.float32) * g_ref)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, a, b, wt)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, a, b, wt)
    for gi, wi, name in zip(got, want, "x a b w".split()):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("concat", [True, False])
def test_both_tap_formulations_match_oracle(concat, monkeypatch):
    """The one-GEMM (CONCAT_TAPS) and nine-dot formulations must agree with
    the oracle — fwd and bwd — so the hardware A/B flag can't change math."""
    import cpg_tpu.ops.pallas.fused_chain as fc

    monkeypatch.setattr(fc, "CONCAT_TAPS", concat)
    x, a, b, wt = _mk(2, 5, 7, 8, 16, seed=5)
    g_ref = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 7, 16))
    got = fused_affine_relu_conv(x, a, b, wt, jnp.float32)
    want = fused_oracle(x, a, b, wt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda *args: jnp.sum(f(*args, jnp.float32) * g_ref)

    got_g = jax.grad(loss(fused_affine_relu_conv), argnums=(0, 1, 2, 3))(
        x, a, b, wt)
    want_g = jax.grad(loss(fused_oracle), argnums=(0, 1, 2, 3))(x, a, b, wt)
    for gi, wi, name in zip(got_g, want_g, "x a b w".split()):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bn_stats_grads_flow_through_affine():
    """Train-mode BN folds stats into (a, b) as functions of x; the chain
    rule through the custom_vjp must match end-to-end autodiff of the
    unfused composition."""
    x, _, _, wt = _mk(2, 4, 4, 8, 8, seed=5)
    gamma = jnp.ones(8) * 1.3
    beta = jnp.full(8, 0.1)

    def bn_fold(x):
        mu = jnp.mean(x, (0, 1, 2))
        var = jnp.var(x, (0, 1, 2))
        inv = jax.lax.rsqrt(var + 1e-5)
        return gamma * inv, beta - mu * gamma * inv

    def f(x, impl):
        a, b = bn_fold(x)
        return jnp.sum(impl(x, a, b, wt, jnp.float32) ** 2)

    got = jax.grad(lambda x: f(x, fused_affine_relu_conv))(x)
    want = jax.grad(lambda x: f(x, fused_oracle))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_unsupported_shapes_fall_back():
    # 1x1-equivalent via tiny spatial dims -> oracle path, still correct
    x, a, b, wt = _mk(2, 2, 2, 4, 4)
    got = fused_affine_relu_conv(x, a, b, wt, jnp.float32)
    want = fused_oracle(x, a, b, wt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pick_tb_divides_and_fits():
    assert _pick_tb(8192, 32, 32, 64, 64) >= 1
    for n in (1, 3, 8, 8192):
        tb = _pick_tb(n, 16, 16, 128, 128)
        assert n % tb == 0
    # budget respected: block1 at b8192 must not blow VMEM
    tb = _pick_tb(8192, 32, 32, 64, 64)
    per_img = 32 * 32 * (64 * 6 + 64 * 6)
    assert tb * per_img <= 8 * 1024 * 1024


def test_xla_fallback_backward_matches():
    """The XLA backward (BWD_PALLAS=False) and the fused Pallas backward
    agree with each other and with autodiff of the oracle."""
    import cpg_tpu.ops.pallas.fused_chain as fc

    x, a, b, wt = _mk(2, 6, 6, 8, 12, seed=11)
    g_ref = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 12))

    def loss(x, a, b, wt):
        return jnp.sum(fused_affine_relu_conv(x, a, b, wt, jnp.float32)
                       * g_ref)

    want = jax.grad(lambda *A: jnp.sum(fused_oracle(*A, jnp.float32) * g_ref),
                    argnums=(0, 1, 2, 3))(x, a, b, wt)
    for flag in (True, False):
        old = fc.BWD_PALLAS
        fc.BWD_PALLAS = flag
        try:
            got = jax.grad(loss, argnums=(0, 1, 2, 3))(x, a, b, wt)
        finally:
            fc.BWD_PALLAS = old
        for gi, wi, name in zip(got, want, "x a b w".split()):
            np.testing.assert_allclose(
                np.asarray(gi), np.asarray(wi), rtol=2e-4, atol=2e-4,
                err_msg=f"bwd_pallas={flag} d{name}")


def test_grown_width_weight_stays_on_pallas_path():
    """Weights past the old 6 MiB cap (grown widths: 608x608 here standing
    in for 768/1024) are still _supported — the kernels ride the v5e's
    128 MiB VMEM with shrunk tiles — and match the oracle fwd + bwd."""
    from cpg_tpu.ops.pallas.fused_chain import _supported

    x, a, b, wt = _mk(2, 4, 4, 608, 608, seed=5)
    assert 9 * 608 * 608 * 2 > 6 * 1024 * 1024  # genuinely past the old cap
    assert _supported(x, wt)

    got = fused_affine_relu_conv(x, a, b, wt, jnp.float32)
    want = fused_oracle(x, a, b, wt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    g_ref = jax.random.normal(jax.random.PRNGKey(9), got.shape)
    grads = jax.grad(lambda *A: jnp.sum(
        fused_affine_relu_conv(*A, jnp.float32) * g_ref),
        argnums=(0, 1, 2, 3))(x, a, b, wt)
    wants = jax.grad(lambda *A: jnp.sum(
        fused_oracle(*A, jnp.float32) * g_ref),
        argnums=(0, 1, 2, 3))(x, a, b, wt)
    for gi, wi, name in zip(grads, wants, "x a b w".split()):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name}")
