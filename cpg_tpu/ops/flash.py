"""Flash attention for the transformer families (opt-in, TPU-first).

The default attention in models/vit.py materializes the (N, H, T, S) score
tensor in f32 plus the softmax'd probabilities, and the backward pass reads
and writes both again — at vit_b16 scale (b128, T=197 padded, 12 blocks)
that is tens of GB of HBM traffic per step for tensors that are pure
intermediates. Flash attention streams K/V tiles through VMEM with an
online softmax so the score matrix NEVER exists in HBM, and the backward
kernel recomputes it tile-by-tile instead of loading it (the standard
FlashAttention recurrence; ref: the reference has no equivalent — its
models are CNNs, `ref:models/` — this is a beyond-reference member of the
transformer family added in r3).

We wrap `jax.experimental.pallas.ops.tpu.flash_attention` (a stock JAX
Pallas TPU kernel with a custom VJP, i.e. fused forward AND backward)
rather than hand-rolling a fourth Pallas kernel: the fused_chain lesson
(RESULTS.md round 3 — 1.45-2.05x SLOWER than XLA, refuted on hardware) is
that hand kernels must earn their place with measurements. MEASURED
VERDICT (r5, PERF_vit_flash_r5.json): at every current family's sequence
length (T <= 256 padded) this kernel is 0.41-0.67x the default XLA fused
attention — it really does delete the score traffic (108.7 -> 74.6
GB/step on vit_b16 b64) but those bytes were VMEM-local in XLA's fusion
anyway, and it does NOT unlock large-batch compiles (b512 flash OOMs
where the default path compiles). flash_attention therefore stays OFF by
default; the flag remains a correct, CPU-parity-tested opt-in for future
long-sequence members where ~T^2 score traffic actually dominates.

Layout/padding contract (this module's whole job):
  * models/vit.py attention() carries (N, T, H, hd); the kernel wants
    (N, H, T, hd) — one transpose each way (cheap next to the score
    traffic it deletes).
  * The kernel tiles sequence in 128-blocks, so T pads up to a multiple
    of 128 (ViT-B/16's T=197 -> 256). Padded positions are masked out of
    the softmax via SegmentIds (pad tokens get a different segment id, and
    the kernel only lets equal ids attend), so real rows never see pad
    keys; pad-row outputs are garbage-by-construction and sliced off,
    which also zeroes their cotangents — gradients w.r.t. the pad region
    of q/k/v are exactly zero and the slice discards them.
  * Masking (CPG ownership/piggymask selection) is untouched: it lives on
    the q/k/v/proj KERNELS (sdense), not in the attention math, so the
    flash path composes with every mask mode, growth, and checkpointing.

CPU (tests, dryrun): the same kernel runs under Pallas' TPU interpreter
(`pltpu.force_tpu_interpret_mode`), matching the repo's _interpret()
convention — parity tests in tests/test_flash_attention.py check fwd and
grads against the einsum oracle. CAVEAT (measured, this jax build):
repeated EAGER dispatch of the interpreted kernel deadlocks on the
single-core CPU host after 2-3 calls (frozen CPU time, not slowness);
under one outer jit — which is every production path: train step, eval
step, serving, dryrun — it is correct and fast. Keep CPU callers jitted.
Second CPU caveat: the custom-VJP BACKWARD kernel is linearized by
jax.grad OUTSIDE this module's interpret-mode scope, so CPU TRAINING with
flash attention requires the caller to wrap the whole grad trace in
`pltpu.force_tpu_interpret_mode()` (tests/test_flash_attention.py does);
on TPU none of this applies. Forward-only CPU use (eval/serving) needs
nothing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu import flash_attention as _fa

_BLOCK = 128  # kernel sequence tile (== upstream MIN_BLOCK_SIZE)

# Trace-time BlockSizes override for perf probes (scripts/perf.py
# --flash-block): None = upstream defaults (all-128 tiles). Bigger tiles
# cut the Pallas grid at short sequence lengths where per-invocation
# overhead dominates. Set via set_block() BEFORE building/jitting a step.
_BLOCK_OVERRIDE = None


def set_block(block: int | None):
    """Use `block`-sized sequence tiles in every kernel (fwd + bwd).
    None restores the upstream defaults. Takes effect at trace time."""
    global _BLOCK_OVERRIDE
    if block is None:
        _BLOCK_OVERRIDE = None
        return
    _BLOCK_OVERRIDE = _fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )


def _pad_len(t: int) -> int:
    m = max(_BLOCK, _BLOCK_OVERRIDE.block_q if _BLOCK_OVERRIDE else _BLOCK)
    return -(-t // m) * m


def _flash_nhtd(q, k, v, causal: bool, sm_scale: float):
    """(N, H, T, hd) flash attention with sequence padding + masking."""
    n, h, t, hd = q.shape
    tp = _pad_len(t)
    seg = None
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        # real tokens segment 0, pad segment 1: unequal ids never attend
        ids = (jnp.arange(tp, dtype=jnp.int32) >= t).astype(jnp.int32)
        ids = jnp.broadcast_to(ids, (n, tp))
        seg = _fa.SegmentIds(q=ids, kv=ids)
    out = _fa.flash_attention(q, k, v, segment_ids=seg, causal=causal,
                              sm_scale=sm_scale,
                              block_sizes=_BLOCK_OVERRIDE)
    return out[:, :, :t, :] if tp != t else out


def flash_mha(q, k, v, *, causal: bool = False):
    """Multi-head attention via the Pallas flash kernel.

    q, k, v: (N, T, H, hd) as produced by models/vit.py attention()'s
    reshape of the sdense outputs. Returns (N, T, H, hd) in q's dtype.
    Scores are scaled by 1/sqrt(hd) inside the kernel (sm_scale), matching
    the einsum path's explicit multiply.
    """
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
    qt, kt, vt = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            out = _flash_nhtd(qt, kt, vt, causal, sm_scale)
    else:
        out = _flash_nhtd(qt, kt, vt, causal, sm_scale)
    return out.transpose(0, 2, 1, 3)
