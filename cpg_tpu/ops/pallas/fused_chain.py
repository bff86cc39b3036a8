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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll0(x, shift):
    """Roll along axis 0. pltpu.roll on TPU; jnp.roll under the interpreter."""
    if _interpret():
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift, axis=0)


_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _fused_kernel(x_ref, a_ref, b_ref, w_ref, o_ref, *, tb, h, w, cin, cout,
                  dot_dtype, out_dtype):
    m = tb * h * w
    xf = x_ref[:].reshape(m, cin).astype(jnp.float32)
    act = jnp.maximum(xf * a_ref[:] + b_ref[:], 0.0).astype(dot_dtype)
    # flattened-row coordinates for the shift masks
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    hh = (r // w) % h
    ww = r % w
    acc = jnp.zeros((m, cout), jnp.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        off = dy * w + dx
        sh = act if off == 0 else _roll0(act, (-off) % m)
        valid = ((hh + dy >= 0) & (hh + dy < h)
                 & (ww + dx >= 0) & (ww + dx < w))
        sh = jnp.where(valid, sh, jnp.zeros((), dot_dtype))
        acc = acc + jnp.dot(sh, w_ref[k * cin:(k + 1) * cin, :],
                            preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(tb, h, w, cout).astype(out_dtype)


def _pick_tb(n, h, w, cin, cout, budget=8 * 1024 * 1024):
    """Largest power-of-two image-block dividing n whose VMEM working set
    (x + act + rolled copy in the dot dtype, f32 accumulator) fits."""
    per_img = h * w * (cin * 2 * 3 + cout * (4 + 2))
    tb = 1
    while tb * 2 <= n and n % (tb * 2) == 0 and (tb * 2) * per_img <= budget:
        tb *= 2
    return tb


def _fwd_pallas(x, a, b, w, dot_dtype):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    tb = _pick_tb(n, h, ww, cin, cout)
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
            and h >= 3 and ww >= 3 and n * h * ww >= 2 * (ww + 1))


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


def _fused_bwd(dot_name, res, g):
    """XLA backward: recompute the (cheap, elementwise) pre-activation for
    the ReLU mask; transposed convs for dact/dw. The activation IS
    materialized here — phase 1 trades only the forward boundary traffic;
    fully-fused backward kernels are the measured next step."""
    dot_dtype = jnp.dtype(dot_name)
    x, a, b, w = res
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


_fused_op.defvjp(_fused_fwd, _fused_bwd)
