"""VMEM-resident fused BN-affine + ReLU + 3x3 conv — the cross-layer chain.

The remaining distance to the VGG step's roofline (RESULTS.md round 3) is
HBM traffic at layer boundaries: XLA materializes the normalized/ReLU'd
activation between conv_i's output and conv_{i+1}'s input (convolutions do
not host fused producers on TPU), costing one extra write + read of the
full activation per boundary. The reference has no analogue — eager torch
launches conv/BN/ReLU as separate cuDNN/elementwise kernels
(ref:models/vgg.py make_layers).

This kernel computes, in one pass over the input:

    y = conv3x3_same(relu(a * x + b), w_eff)

where (a, b) is the folded BatchNorm affine (a = gamma*rsqrt(var+eps),
b = beta - mean*a — batch stats in train mode, running stats in eval), so
the normalized activation lives only in VMEM.

Formulation (why this one): the round-2 Pallas conv lowered via
conv_general_dilated_patches — a 9x-larger im2col tensor materialized in
HBM — and measured 23x slower than XLA (RESULTS.md); the defect was the
formulation, not the MXU. Here a block of WHOLE images (TB, H, W, C) is
staged in VMEM, flattened (layout-preserving) to (TB*H*W, C), and the 3x3
conv is nine shift-and-mask matmuls accumulated in f32:

    y2d = sum_{dy,dx} mask(dy,dx) . roll(act, -(dy*W+dx)) @ w[dy,dx]

Rolling the flattened rows by dy*W+dx realizes the spatial shift; rows whose
(h+dy, w+dx) fall outside the image are masked to zero (SAME padding). All
nine products hit the MXU with M = TB*H*W (large) and K = C; nothing but x
and y touches HBM.

Scope: stride-1 SAME 3x3 convs — every conv in VGG16 (ref:models/vgg.py
cfg) and all non-downsampling 3x3s in ResNet. The wrapper falls back to the
XLA oracle for shapes the kernel does not cover.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll0(x, shift):
    """Roll along axis 0. pltpu.roll on TPU; jnp.roll under the interpreter.

    Mosaic's rotate op only exists for 32-bit element types ("not
    implemented: Rotate with non-32-bit data", observed on the real v5e
    toolchain r3) — callers must roll f32/i32 and cast to the MXU dtype
    AFTER the roll."""
    assert x.dtype.itemsize == 4, "TPU rotate supports 32-bit data only"
    if _interpret():
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift, axis=0)


_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

# One K=9C matmul over lane-concatenated shifted taps vs nine K=C matmuls.
# The 9-dot form runs the MXU at K=C per product — at C=64 (VGG block1) that
# measured 23 TFLOPS vs XLA's 106 (r3 micro A/B); concatenating the taps
# trades +9C*2B/row of VMEM for a single well-shaped GEMM. Flag for A/B
# (env CPG_FUSED_CONCAT=0 selects the nine-dot form without code edits).
CONCAT_TAPS = os.environ.get("CPG_FUSED_CONCAT", "1") != "0"


def _fused_kernel(x_ref, a_ref, b_ref, w_ref, o_ref, *, tb, h, w, cin, cout,
                  dot_dtype, out_dtype):
    m = tb * h * w
    xf = x_ref[:].reshape(m, cin).astype(jnp.float32)
    act32 = jnp.maximum(xf * a_ref[:] + b_ref[:], 0.0)
    act = act32.astype(dot_dtype)
    # flattened-row coordinates for the shift masks
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    hh = (r // w) % h
    ww = r % w
    taps = []
    acc = jnp.zeros((m, cout), jnp.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        off = dy * w + dx
        # roll in f32 (Mosaic rotate is 32-bit only), cast for the MXU after
        sh = act if off == 0 else _roll0(act32, (-off) % m).astype(dot_dtype)
        valid = ((hh + dy >= 0) & (hh + dy < h)
                 & (ww + dx >= 0) & (ww + dx < w))
        sh = jnp.where(valid, sh, jnp.zeros((), dot_dtype))
        if CONCAT_TAPS:
            taps.append(sh)
        else:
            acc = acc + jnp.dot(sh, w_ref[k * cin:(k + 1) * cin, :],
                                preferred_element_type=jnp.float32)
    if CONCAT_TAPS:
        acc = jnp.dot(jnp.concatenate(taps, axis=1), w_ref[:],
                      preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(tb, h, w, cout).astype(out_dtype)


def _pick_tb(n, h, w, cin, cout, budget=8 * 1024 * 1024, cin_bytes=None):
    """Largest power-of-two image-block dividing n whose VMEM working set
    fits. The roll intermediates are f32 (Mosaic rotate is 32-bit only):
    x bf16 + act f32 + act bf16 + rolled f32 + its bf16 cast ~ 12B/cin
    element; with CONCAT_TAPS the nine bf16 shifted taps are live at once
    (+18B/cin). f32 accumulator + out ~ 6B/cout element."""
    if cin_bytes is None:
        cin_bytes = 30 if CONCAT_TAPS else 12
    per_img = h * w * (cin * cin_bytes + cout * 6)
    tb = 1
    while tb * 2 <= n and n % (tb * 2) == 0 and (tb * 2) * per_img <= budget:
        tb *= 2
    return tb


def _tile_budget(small, wbytes, resident):
    """Tile budget for a kernel whose block-constant resident buffer is
    `resident` bytes (bf16 weight / f32 dW accumulator). Weights inside the
    original 6 MiB cap keep the originally-tuned budget (`small`) so the
    measured mult-1.0 path is untouched; larger weights (grown widths, up to
    1024x1024) draw on the v5e's 128 MiB VMEM with a ~48 MB working-set
    target."""
    if wbytes <= 6 * 1024 * 1024:
        return small
    return max(2 * 1024 * 1024, 48 * 1024 * 1024 - resident)


def _fwd_pallas(x, a, b, w, dot_dtype):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    wb = 9 * cin * cout * 2
    tb = _pick_tb(n, h, ww, cin, cout,
                  budget=_tile_budget(8 * 1024 * 1024, wb, wb))
    w2 = w.reshape(9 * cin, cout).astype(dot_dtype)
    a2 = a.reshape(1, cin).astype(jnp.float32)
    b2 = b.reshape(1, cin).astype(jnp.float32)
    m = tb * h * ww
    grid = (n // tb,)
    return pl.pallas_call(
        functools.partial(_fused_kernel, tb=tb, h=h, w=ww, cin=cin, cout=cout,
                          dot_dtype=dot_dtype, out_dtype=dot_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, h, ww, cin), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, h, ww, cout), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), dot_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * ww * 9 * cin * cout,
            bytes_accessed=(n * h * ww * cin * 2 + 9 * cin * cout * 2
                            + n * h * ww * cout * 2),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, a2, b2, w2)


def fused_oracle(x, a, b, w, dot_dtype=jnp.float32):
    """XLA reference: materialized act, then a plain conv (what the default
    unfused path does in two kernels)."""
    act = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(dot_dtype)
    return jax.lax.conv_general_dilated(
        act, w.astype(dot_dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dot_dtype,
    )


def _supported(x, w):
    kh, kw, cin, cout = w.shape
    n, h, ww, c = x.shape
    return (kh == 3 and kw == 3 and c == cin
            # flattened rows must be sublane-friendly and rolls in-bounds
            and h >= 3 and ww >= 3 and n * h * ww >= 2 * (ww + 1)
            # largest resident buffer is the backward's f32 (9C, Cout) dW
            # accumulator; capped so worst-case kernel residency (dW + double-
            # buffered tiles under the _pick_tb budgets) stays < ~60 MB of the
            # v5e's 128 MiB VMEM. Covers width-mult 2.0 VGG (1024x1024,
            # 37.7 MB); beyond that falls back to XLA
            and 9 * cin * cout * 4 <= 40 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_op(x, a, b, w, dot_name):
    # dot_name is a STRING ('bfloat16'/'float32'): jnp dtype classes trip
    # custom_vjp's nondiff abstractify ("JAX scalar type cannot be
    # interpreted as a JAX array"); strings are plain hashables.
    dot_dtype = jnp.dtype(dot_name)
    if not _supported(x, w):
        return fused_oracle(x, a, b, w, dot_dtype)
    return _fwd_pallas(x, a, b, w, dot_dtype)


def fused_affine_relu_conv(x, a, b, w, dot_dtype=jnp.bfloat16):
    """y = conv3x3_same(relu(a*x + b), w), the normalized activation never
    leaving VMEM. x: (N,H,W,Cin); a,b: (Cin,) f32 folded-BN affine; w:
    (3,3,Cin,Cout) effective (already masked) weight. Differentiable in
    x, a, b, w — BN train-mode stats gradients flow through a(x), b(x) at
    the call site. Falls back to the XLA oracle off the supported shape."""
    return _fused_op(x, a, b, w, jnp.dtype(dot_dtype).name)


def _fused_fwd(x, a, b, w, dot_name):
    return _fused_op(x, a, b, w, dot_name), (x, a, b, w)


# --------------------------------------------------------------------------
# fused backward: dx/da/db in one kernel, dW in another — the normalized
# activation is recomputed in VMEM from x (elementwise) instead of being
# materialized in HBM, mirroring the forward's traffic story.
#
# With S_k = mask_k . roll(-off_k) the forward is y = sum_k S_k(act) @ W_k,
# so  dact = sum_k roll(+off_k, mask_k . (g @ W_k^T))        (dx kernel)
#     dW_k = act^T @ roll(+off_k, mask_k . g)                (dw kernel)
# and dx = dact * a * 1[pre>0], da = sum dact*1[.]*x, db = sum dact*1[.].
# --------------------------------------------------------------------------


def _bwd_dx_kernel(x_ref, g_ref, a_ref, b_ref, w_ref, dx_ref, da_ref, db_ref,
                   *, tb, h, w, cin, cout, dot_dtype, nb):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    m = tb * h * w
    xf = x_ref[:].reshape(m, cin).astype(jnp.float32)
    pre = xf * a_ref[:] + b_ref[:]
    g2 = g_ref[:].reshape(m, cout).astype(dot_dtype)
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    hh = (r // w) % h
    ww = r % w
    dact = jnp.zeros((m, cin), jnp.float32)
    # all nine g @ W_k^T products as ONE (m, 9cin) GEMM when CONCAT_TAPS —
    # the per-tap N=cin products starve the MXU at small cin (see fwd note)
    U = (jax.lax.dot_general(g2, w_ref[:],
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         if CONCAT_TAPS else None)
    for k, (dy, dx_) in enumerate(_OFFSETS):
        off = dy * w + dx_
        if CONCAT_TAPS:
            u = U[:, k * cin:(k + 1) * cin]
        else:
            u = jax.lax.dot_general(
                g2, w_ref[k * cin:(k + 1) * cin, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        valid = ((hh + dy >= 0) & (hh + dy < h)
                 & (ww + dx_ >= 0) & (ww + dx_ < w))
        u = jnp.where(valid, u, 0.0)
        dact = dact + (u if off == 0 else _roll0(u, off % m))
    dmasked = jnp.where(pre > 0, dact, 0.0)
    dx_ref[:] = (dmasked * a_ref[:]).reshape(tb, h, w, cin).astype(
        dx_ref.dtype)
    da_ref[:] += jnp.sum(dmasked * xf, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dmasked, axis=0, keepdims=True)


def _bwd_dw_kernel(x_ref, g_ref, a_ref, b_ref, dw_ref, *, tb, h, w, cin,
                   cout, dot_dtype, nb):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    m = tb * h * w
    xf = x_ref[:].reshape(m, cin).astype(jnp.float32)
    act = jnp.maximum(xf * a_ref[:] + b_ref[:], 0.0).astype(dot_dtype)
    g32 = g_ref[:].reshape(m, cout).astype(jnp.float32)
    g2 = g32.astype(dot_dtype)
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    hh = (r // w) % h
    ww = r % w
    for k, (dy, dx_) in enumerate(_OFFSETS):
        off = dy * w + dx_
        valid = ((hh + dy >= 0) & (hh + dy < h)
                 & (ww + dx_ >= 0) & (ww + dx_ < w))
        if off == 0:
            gm = jnp.where(valid, g2, jnp.zeros((), dot_dtype))
        else:
            # mask+roll in f32 (Mosaic rotate is 32-bit only), cast after
            gm = _roll0(jnp.where(valid, g32, 0.0), off % m).astype(dot_dtype)
        dw_ref[k * cin:(k + 1) * cin, :] += jax.lax.dot_general(
            act, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_pallas(x, a, b, w, g, dot_dtype):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    # dx kernel budget: x/g/act tiles + f32 dact + the (9C, Cout) weight;
    # under CONCAT_TAPS the (m, 9cin) f32 U product is live too (+36B/cin)
    wb = 9 * cin * cout * 2
    tb = _pick_tb(n, h, ww, cin, cout,
                  budget=_tile_budget(10 * 1024 * 1024 - wb, wb, wb),
                  cin_bytes=44 if CONCAT_TAPS else 12)
    w2 = w.reshape(9 * cin, cout).astype(dot_dtype)
    a2 = a.reshape(1, cin).astype(jnp.float32)
    b2 = b.reshape(1, cin).astype(jnp.float32)
    nb = n // tb
    dx, da, db = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, tb=tb, h=h, w=ww, cin=cin,
                          cout=cout, dot_dtype=dot_dtype, nb=nb),
        grid_spec=pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((tb, h, ww, cin), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((tb, h, ww, cout), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((tb, h, ww, cin), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, ww, cin), x.dtype),
            jax.ShapeDtypeStruct((1, cin), jnp.float32),
            jax.ShapeDtypeStruct((1, cin), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # da/db accumulate across i
        ),
        interpret=_interpret(),
    )(x, g, a2, b2, w2)
    # dW in its own pass: its (9C, Cout) f32 accumulator is the VMEM budget
    tbw = _pick_tb(n, h, ww, cin, cout,
                   budget=_tile_budget(
                       max(2 * 1024 * 1024, 12 * 1024 * 1024 - 2 * wb),
                       wb, 2 * wb),
                   cin_bytes=12)  # dW kernel has no concatenated taps
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, tb=tbw, h=h, w=ww, cin=cin,
                          cout=cout, dot_dtype=dot_dtype, nb=n // tbw),
        grid_spec=pl.GridSpec(
            grid=(n // tbw,),
            in_specs=[
                pl.BlockSpec((tbw, h, ww, cin), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((tbw, h, ww, cout), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
                pl.BlockSpec((1, cin), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # dW accumulates across i
        ),
        interpret=_interpret(),
    )(x, g, a2, b2)
    return (dx, da.reshape(cin), db.reshape(cin),
            dw.reshape(3, 3, cin, cout))


def _fused_bwd_xla(dot_dtype, x, a, b, w, g):
    """XLA backward: recompute the (cheap, elementwise) pre-activation for
    the ReLU mask; transposed convs for dact/dw. The activation IS
    materialized here — fallback for shapes the Pallas kernels skip."""
    pre = x.astype(jnp.float32) * a + b
    mask = pre > 0
    act = jnp.where(mask, pre, 0.0).astype(dot_dtype)
    gf = g.astype(dot_dtype)
    # d/dact: conv with the spatially-flipped, IO-swapped kernel (stride-1
    # SAME 3x3 exact transpose)
    w_rot = jnp.flip(w, (0, 1)).swapaxes(2, 3).astype(dot_dtype)
    dact = jax.lax.conv_general_dilated(
        gf, w_rot, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # filter grad: contract batch — relabel N as the contraction feature
    dw = jax.lax.conv_general_dilated(
        act, gf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32,
    )
    dmasked = dact * mask  # f32
    dx = (dmasked * a).astype(x.dtype)
    da = jnp.sum(dmasked * x.astype(jnp.float32), axis=(0, 1, 2))
    db = jnp.sum(dmasked, axis=(0, 1, 2))
    return dx, da.astype(a.dtype), db.astype(b.dtype), dw.astype(w.dtype)


# flip to False to A/B the XLA fallback backward (perf scripts); the Pallas
# path recomputes the activation in VMEM instead of materializing it in HBM
BWD_PALLAS = True


def _fused_bwd(dot_name, res, g):
    x, a, b, w = res
    dot_dtype = jnp.dtype(dot_name)
    if BWD_PALLAS and _supported(x, w):
        dx, da, db, dw = _bwd_pallas(x, a, b, w, g, dot_dtype)
        return (dx, da.astype(a.dtype), db.astype(b.dtype),
                dw.astype(w.dtype))
    return _fused_bwd_xla(dot_dtype, x, a, b, w, g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)
