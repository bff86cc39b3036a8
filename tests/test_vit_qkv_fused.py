"""Fused-QKV GEMM in models/vit.py attention() vs the per-projection oracle.

attention() computes q/k/v as ONE (D, 3*inner) GEMM on the effective-params
path (block input read once, 3x wider MXU tile) while keeping the three
kernels separate params. These tests pin the claim that the fusion is a
pure graph optimization: same params, same math, bit-equal outputs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.models import framework as fw
from cpg_tpu.models.vit import attention


def _attn_model(ctx, x, num_classes=None, mult=1.0):
    del num_classes
    return attention(ctx, "attn", x, heads_n=int(2 * mult), head_dim=32)


def _oracle(shared, private, x):
    """Per-projection dots + einsum softmax — the unfused math."""
    inner = shared["attn/q/kernel"].shape[1]
    hd = 32
    h = inner // hd
    n, t, d = x.shape
    qkv = []
    for p in "qkv":
        y = jnp.dot(x, shared[f"attn/{p}/kernel"]) + private[f"attn/{p}/bias"]
        qkv.append(y.reshape(n, t, h, hd))
    q, k, v = qkv
    scores = jnp.einsum("nthd,nshd->nhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / hd ** 0.5)
    att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhts,nshd->nthd", att, v,
                     preferred_element_type=x.dtype)
    out = out.reshape(n, t, inner)
    return jnp.dot(out, shared["attn/proj/kernel"]) + private["attn/proj/bias"]


def test_fused_qkv_matches_oracle_f32():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 48), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), _attn_model, x)
    got, _ = fw.apply(_attn_model, shared, private, bn, x, train=False)
    want = _oracle(shared, private, x)
    # bit-equal is the design claim; fall back would indicate the GEMM
    # fusion changed contraction order somewhere
    np.testing.assert_array_equal(np.array(got), np.array(want))


def test_fused_qkv_grads_match_oracle():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 48), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), _attn_model, x)

    def loss_fused(shared):
        y, _ = fw.apply(_attn_model, shared, private, bn, x, train=False)
        return (y ** 2).sum()

    def loss_oracle(shared):
        return (_oracle(shared, private, x) ** 2).sum()

    g_got = jax.grad(loss_fused)(shared)
    g_want = jax.grad(loss_oracle)(shared)
    for k in g_want:
        np.testing.assert_allclose(np.array(g_got[k]), np.array(g_want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_fused_qkv_growth_mult():
    """Growth changes inner (new heads) — the fused GEMM follows the grown
    kernel shapes with no special casing."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 48), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), _attn_model, x,
                                  mult=2.0)
    assert shared["attn/q/kernel"].shape == (48, 4 * 32)
    got, _ = fw.apply(_attn_model, shared, private, bn, x, train=False,
                      mult=2.0)
    assert got.shape == (2, 9, 48)
