"""Fused masked matmul Pallas kernels — the SharableLinear hot path.

Reference (ref:models/layers.py SharableConv2d/SharableLinear) launches three
eager CUDA kernels per layer per step: binarize(piggymask), mask*weight, then
cuDNN GEMM. Here the ownership select + piggymask binarize + multiply happen
on the weight TILE already staged in VMEM, so the effective weight is never
materialized in HBM:

    y = x @ w_eff,   w_eff = w            where own == task_id
                           = 1[pm>thr]*w  where 0 < own < task_id
                           = 0            elsewhere

Three kernels cover training end-to-end (wired up via jax.custom_vjp):
  * forward        y  (M,K)x(K,N): mask fused into the B-tile load
  * backward dx    dx = g @ w_eff^T: mask fused into the (transposed) B-tile
  * backward dw/dpm: G = x^T @ g accumulated tile-wise, then the ownership
    gating (dw = G on own==tid else 0) and STE mask grad (dpm = G*w on prior
    entries else 0) fused into the epilogue — the train step's gate_and_decay
    for this layer collapses into the kernel.

All dims are padded to 128 multiples by the caller wrapper; padded ownership
entries are FREE(0) so they contribute exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.binarize import DEFAULT_THRESHOLD

TILE = 128


def _blk(dim: int, pref: int) -> int:
    """Block size: prefer `pref` when the dim fills it, else the 128 minimum."""
    return pref if dim >= pref else TILE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad2(a, m0, m1):
    p0 = (-a.shape[0]) % m0
    p1 = (-a.shape[1]) % m1
    if p0 or p1:
        a = jnp.pad(a, ((0, p0), (0, p1)))
    return a


def _mask_tile(w, own, pm, tid, threshold, dot_dtype, mask_mode="binary"):
    """Effective-weight selection on one VMEM tile.

    mask_mode 'binary' (ref Binarizer: pm > thr picks +w) or 'ternary'
    (ref Ternarizer: pm > thr picks +w, pm < 0 picks -w — prior weights can
    be reused with flipped sign). Select in the weight's own dtype, then cast
    to `dot_dtype` (= the activation dtype) so the MXU runs its fast bf16
    path when training in bf16 — an f32 dot on v5e is ~4x slower."""
    wf = w.astype(jnp.float32)
    owned = own == tid
    prior = (own > 0) & (own < tid)
    if mask_mode == "ternary":
        picked = jnp.where(pm > threshold, wf, jnp.where(pm < 0, -wf, 0.0))
    else:
        picked = jnp.where(pm > threshold, wf, 0.0)
    return jnp.where(owned, wf, jnp.where(prior, picked, 0.0)).astype(dot_dtype)


# --------------------------------------------------------------------------
# forward: y[i,j] = sum_k x[i,k] * w_eff[k,j]
# --------------------------------------------------------------------------


def _fwd_kernel(tid_ref, x_ref, w_ref, own_ref, pm_ref, o_ref, acc_ref,
                *, threshold, out_dtype, nk, mask_mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tid = tid_ref[0]
    weff = _mask_tile(w_ref[:], own_ref[:].astype(jnp.int32), pm_ref[:], tid,
                      threshold, x_ref.dtype, mask_mode)
    acc_ref[:] += jnp.dot(x_ref[:], weff, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _fwd(x, w, own, pm, task_id, threshold, mask_mode):
    m, k0 = x.shape
    _, n0 = w.shape
    # bm as large as fits: the w/own/pm side is 9B per weight, so every extra
    # M-pass re-reads it all from HBM; one pass makes the kernel w-traffic
    # optimal (the whole point of fusing the mask into the tile load).
    # Tuned on v5e (1024x4096x4096 bf16): (bm,bn,bk)=(1024,1024,256) hits
    # 29.4 TFLOPS vs 20.0 for (1024,256,512); wider-N/shorter-K pipelines
    # better, and bn=1024/bk=512 exceeds the 16MB VMEM budget.
    bm = _blk(m, 1024 if m >= 1024 else (512 if m >= 512 else 256))
    bn = _blk(n0, 1024 if n0 >= 1024 else 256)
    bk = _blk(k0, 256)
    xp = _pad2(x, bm, bk)
    wp = _pad2(w, bk, bn)
    ownp = _pad2(own, bk, bn)
    pmp = _pad2(pm, bk, bn)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // bk
    grid = (mp // bm, np_ // bn, nk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, threshold=threshold, out_dtype=x.dtype,
                          nk=nk, mask_mode=mask_mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, s: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda i, j, k, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda i, j, k, s: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, s: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp, bytes_accessed=mp * kp * 2 + kp * np_ * 9
            + mp * np_ * 2, transcendentals=0,
        ),
        interpret=_interpret(),
    )(jnp.asarray([task_id], jnp.int32), xp, wp, ownp, pmp)
    return out[:m, :n0]


# --------------------------------------------------------------------------
# backward dx: dx[i,k] = sum_j g[i,j] * w_eff[k,j]   (contract over N)
# --------------------------------------------------------------------------


def _bwd_dx_kernel(tid_ref, g_ref, w_ref, own_ref, pm_ref, o_ref, acc_ref,
                   *, threshold, out_dtype, nj, mask_mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tid = tid_ref[0]
    weff = _mask_tile(w_ref[:], own_ref[:].astype(jnp.int32), pm_ref[:], tid,
                      threshold, g_ref.dtype, mask_mode)
    # g (TM,TN) x w_eff (TK,TN) contracting the N axis -> (TM,TK)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], weff,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _bwd_dx(g, w, own, pm, task_id, threshold, x_dtype, mask_mode):
    m, n0 = g.shape
    k0 = w.shape[0]
    # same tuning shape as the forward: wide output columns, short inner slabs
    bm = _blk(m, 1024 if m >= 1024 else (512 if m >= 512 else 256))
    bk = _blk(k0, 1024 if k0 >= 1024 else 256)
    bn = _blk(n0, 256)
    gp = _pad2(g, bm, bn)
    wp = _pad2(w, bk, bn)
    ownp = _pad2(own, bk, bn)
    pmp = _pad2(pm, bk, bn)
    mp, np_ = gp.shape
    kp = wp.shape[0]
    nj = np_ // bn
    grid = (mp // bm, kp // bk, nj)
    out = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, threshold=threshold,
                          out_dtype=x_dtype, nj=nj, mask_mode=mask_mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, k, j, s: (i, j)),
                pl.BlockSpec((bk, bn), lambda i, k, j, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda i, k, j, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda i, k, j, s: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bk), lambda i, k, j, s: (i, k)),
            scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, kp), x_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray([task_id], jnp.int32), gp, wp, ownp, pmp)
    return out[:m, :k0]


# --------------------------------------------------------------------------
# backward dw & dpm: G = x^T @ g, then gate in the epilogue
#   dw  = G        where own == tid else 0   (ownership gradient gating)
#   dpm = G * w    where 0 < own < tid else 0 (STE piggymask grad)
# --------------------------------------------------------------------------


def _bwd_dw_kernel(tid_ref, x_ref, g_ref, w_ref, own_ref, dw_ref, dpm_ref,
                   acc_ref, *, ni):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # x (TM,TK) x g (TM,TN) contracting M -> (TK,TN); fast path when both bf16
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], g_ref[:].astype(x_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == ni - 1)
    def _():
        tid = tid_ref[0]
        own = own_ref[:].astype(jnp.int32)
        g_acc = acc_ref[:]
        dw_ref[:] = jnp.where(own == tid, g_acc, 0.0)
        prior = (own > 0) & (own < tid)
        dpm_ref[:] = jnp.where(prior, g_acc * w_ref[:].astype(jnp.float32), 0.0)


def _bwd_dw(x, g, w, own, task_id):
    k0, n0 = w.shape
    m = x.shape[0]
    bk = _blk(k0, 256)
    bn = _blk(n0, 1024 if n0 >= 1024 else 256)
    bm = _blk(m, 256)
    xp = _pad2(x, bm, bk)
    gp = _pad2(g, bm, bn)
    wp = _pad2(w, bk, bn)
    ownp = _pad2(own, bk, bn)
    mp, kp = xp.shape
    np_ = gp.shape[1]
    ni = mp // bm
    grid = (kp // bk, np_ // bn, ni)
    dw, dpm = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, ni=ni),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda k, j, i, s: (i, k)),
                pl.BlockSpec((bm, bn), lambda k, j, i, s: (i, j)),
                pl.BlockSpec((bk, bn), lambda k, j, i, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda k, j, i, s: (k, j)),
            ],
            out_specs=(
                pl.BlockSpec((bk, bn), lambda k, j, i, s: (k, j)),
                pl.BlockSpec((bk, bn), lambda k, j, i, s: (k, j)),
            ),
            scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, np_), jnp.float32),
            jax.ShapeDtypeStruct((kp, np_), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray([task_id], jnp.int32), xp, gp, wp, ownp)
    return dw[:k0, :n0], dpm[:k0, :n0]


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def masked_matmul(x, w, own, pm, task_id, threshold=DEFAULT_THRESHOLD,
                  mask_mode="binary"):
    """y = x @ w_eff with ownership/piggymask selection fused into the tiles.

    x: (M, K); w, own, pm: (K, N); task_id: int scalar; mask_mode 'binary' |
    'ternary' (ref Binarizer/Ternarizer). Returns (M, N) in x.dtype.
    Gradients: dx (masked), dw gated to own==task_id, dpm the STE grad on
    prior-task entries (identical for both modes: d(t*w)/dpm = w under the
    straight-through estimator); d(own) = d(task_id) = None.
    """
    return _fwd(x, w, own, pm, task_id, threshold, mask_mode)


def _mm_fwd(x, w, own, pm, task_id, threshold, mask_mode):
    y = _fwd(x, w, own, pm, task_id, threshold, mask_mode)
    return y, (x, w, own, pm, task_id)


def _mm_bwd(threshold, mask_mode, res, g):
    x, w, own, pm, task_id = res
    dx = _bwd_dx(g, w, own, pm, task_id, threshold, x.dtype, mask_mode)
    dw, dpm = _bwd_dw(x, g, w, own, task_id)
    return dx, dw.astype(w.dtype), None, dpm.astype(pm.dtype), None


masked_matmul.defvjp(_mm_fwd, _mm_bwd)


def masked_matmul_reference(x, w, own, pm, task_id,
                            threshold=DEFAULT_THRESHOLD,
                            mask_mode="binary"):
    """jnp oracle with identical semantics (binarize STE handled by caller's
    effective_params path; here the plain forward for parity checks)."""
    tid = jnp.asarray(task_id, jnp.int32)
    own = own.astype(jnp.int32)
    wf = w.astype(jnp.float32)
    if mask_mode == "ternary":
        picked = jnp.where(pm > threshold, wf, jnp.where(pm < 0, -wf, 0.0))
    else:
        picked = jnp.where(pm > threshold, wf, 0.0)
    weff = jnp.where(
        own == tid, wf,
        jnp.where((own > 0) & (own < tid), picked, 0.0))
    return jnp.dot(x.astype(jnp.float32), weff).astype(x.dtype)
