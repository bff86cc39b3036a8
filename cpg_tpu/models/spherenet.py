"""SphereNet-20 + AngleLinear (A-Softmax) head for face verification.

Reference: ref:models/spherenet.py — the SphereFace 20-layer residual CNN for
112x96 aligned face crops: 4 stages of (stride-2 conv + residual units), all
convs SharableConv2d, PReLU activations task-private, fc5 -> 512-d embedding;
`AngleLinear` head (m=4 angular margin) for CASIA-WebFace training
(ref:CPG_face_main.py); later tasks (expression/gender/age) attach plain
heads on the shared trunk.

The fc5 layer's input is a spatial flatten -> growth uses the
flatten-permutation embed; `FLATTEN_DIMS` below feeds grow_state.
"""

from __future__ import annotations

import jax.numpy as jnp

from .framework import Ctx, head, normal_init, prelu, sconv, sdense, xavier_normal
from .vgg import scale_channels

# stage -> (channels, residual units); SphereFace-20: 64/128/256/512, 1/2/4/1
STAGES = [(64, 1), (128, 2), (256, 4), (512, 1)]
EMBED_DIM = 512
INPUT_HW = (112, 96)
_FLAT_HW = (7, 6)  # 112/16 x 96/16 after four stride-2 convs


def _unit(ctx: Ctx, name: str, x, c: int):
    y = sconv(ctx, f"{name}/conv1", x, c, kernel=3,
              kernel_init=normal_init(0.01))
    y = prelu(ctx, f"{name}/prelu1", y)
    y = sconv(ctx, f"{name}/conv2", y, c, kernel=3,
              kernel_init=normal_init(0.01))
    y = prelu(ctx, f"{name}/prelu2", y)
    return x + y


def spherenet20(ctx: Ctx, x, num_classes: int, mult: float = 1.0,
                head_type: str = "angle"):
    """x: (N, 112, 96, 3), preprocessed (x-127.5)/128.

    head_type: 'angle' -> (cos_theta, phi_theta) AngleLinear outputs;
               'linear' -> plain task head logits (expression/gender/age);
               'none'   -> 512-d embedding (LFW verification).
    """
    for si, (c0, units) in enumerate(STAGES):
        c = scale_channels(c0, mult)
        # explicit pad 1 (torch Conv2d(padding=1)): at stride 2, XLA "SAME"
        # pads (0,1) and samples a grid offset by one pixel from the
        # reference — converted pretrained weights would silently mismatch
        x = sconv(ctx, f"stage{si + 1}/down", x, c, kernel=3, stride=2,
                  padding=1, kernel_init=xavier_normal)
        x = prelu(ctx, f"stage{si + 1}/down_prelu", x)
        for ui in range(units):
            x = _unit(ctx, f"stage{si + 1}/unit{ui}", x, c)
    x = x.reshape(x.shape[0], -1)  # (N, 7*6*512m)
    emb = sdense(ctx, "fc5", x, scale_channels(EMBED_DIM, mult),
                 kernel_init=xavier_normal)
    if head_type == "none":
        return emb
    if head_type == "linear":
        return head(ctx, "classifier", emb, num_classes)
    return angle_linear(ctx, "classifier_angle", emb, num_classes)


def spherenet_flatten_dims(mult: float = 1.0):
    """grow_state flatten_dims entry for fc5 (channels interleave in the
    flattened index — see core/grow.py)."""
    return {"fc5/kernel": _FLAT_HW}


# --------------------------------------------------------------------------
# AngleLinear: A-Softmax with m=4 (ref:models/spherenet.py AngleLinear)
# --------------------------------------------------------------------------


def angle_linear(ctx: Ctx, name: str, x, num_classes: int, m: int = 4):
    """Returns (cos_theta*|x|, phi_theta*|x|), both (N, C).

    psi(theta) = (-1)^k cos(m*theta) - 2k on [k*pi/m, (k+1)*pi/m];
    for m=4: cos(4t) = 8c^4 - 8c^2 + 1 with c = cos(theta).
    The head weight is task-private (renormalized every forward, matching the
    reference's F.normalize on weight).
    """
    w = ctx.private_param(f"{name}/kernel", (x.shape[-1], num_classes),
                          lambda r, s: xavier_normal(r, s))
    xf = x.astype(jnp.float32)
    x_norm = jnp.linalg.norm(xf, axis=1, keepdims=True)  # (N,1)
    w_unit = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
    cos = jnp.clip((xf / (x_norm + 1e-12)) @ w_unit, -1.0, 1.0)
    if m != 4:
        raise NotImplementedError("reference uses m=4")
    cos_m = 8.0 * cos**4 - 8.0 * cos**2 + 1.0
    theta = jnp.arccos(cos)
    k = jnp.floor(theta * m / jnp.pi)
    phi = (-1.0) ** k * cos_m - 2.0 * k
    return cos * x_norm, phi * x_norm
