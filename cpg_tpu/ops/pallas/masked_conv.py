"""Fused masked conv = implicit GEMM over the fused masked matmul.

Reference hot path (ref:models/layers.py SharableConv2d): binarize + mask-mul
+ cuDNN conv as three kernels. Here the conv lowers to patch extraction
(XLA's conv_general_dilated_patches, differentiable) followed by the Pallas
fused masked matmul (ops/pallas/masked_matmul.py), so the ownership/piggymask
selection happens inside the GEMM tile loads and the effective kernel never
hits HBM. The patches' feature axis is ordered (cin, kh, kw), so the HWIO
weight/ownership/piggymask tensors are transposed to (C,H,W,O) before the
2D reshape — a real relayout, fused by XLA into the producing ops.

Note: XLA's native convs are extremely good on TPU; this path exists for
parity with the north-star kernel story and wins only when the weight tensor
dominates traffic (large cin*cout, small spatial). Benchmark before
defaulting to it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..binarize import DEFAULT_THRESHOLD
from .masked_matmul import masked_matmul


def masked_conv2d(x, w, own, pm, task_id, stride: int = 1, padding="SAME",
                  threshold: float = DEFAULT_THRESHOLD,
                  mask_mode: str = "binary"):
    """NHWC conv with HWIO weight; ownership/piggymask shaped like w.

    y[n,i,j,o] = sum_{dh,dw,c} x_pad[n, i*s+dh, j*s+dw, c] * w_eff[dh,dw,c,o]
    """
    kh, kw, cin, cout = w.shape
    n = x.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, Ho, Wo, cin*kh*kw) with feature order (c, dh, dw)
    ho, wo = patches.shape[1], patches.shape[2]
    pmat = patches.reshape(n * ho * wo, cin * kh * kw)
    # patches feature axis is (cin, kh, kw); reorder w to match: (C,H,W,O)
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    own2 = jnp.transpose(own, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    pm2 = jnp.transpose(pm, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    y = masked_matmul(pmat, w2, own2, pm2, task_id, threshold, mask_mode)
    return y.reshape(n, ho, wo, cout)


def masked_conv2d_reference(x, w, own, pm, task_id, stride=1, padding="SAME",
                            threshold=DEFAULT_THRESHOLD):
    """XLA oracle: select effective weight, then a plain conv."""
    tid = jnp.asarray(task_id, jnp.int32)
    o = own.astype(jnp.int32)
    wf = w.astype(jnp.float32)
    weff = jnp.where(o == tid, wf,
                     jnp.where((o > 0) & (o < tid),
                               jnp.where(pm > threshold, wf, 0.0), 0.0))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), weff, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
