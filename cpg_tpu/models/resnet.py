"""ResNet-50 with sharable convs, width-multiplier-aware, multi-head.

Reference: ref:models/resnet.py — torchvision-style ResNet-50 whose convs are
SharableConv2d (ownership-masked), BN affine/stats + downsample BNs + the
per-dataset classifier head task-private; every channel count scaled by the
width multiplier. Used by the fine-grained sequence (ImageNet -> CUBS ->
Cars -> Flowers -> WikiArt -> Sketch, ref:CPG_imagenet_main.py).

NHWC / HWIO throughout; global average pool feeds the head, so growth is a
plain block embed (no flatten permutation needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .framework import (Ctx, batchnorm, fused_bn_relu_sconv, head, relu,
                        sconv)
from .vgg import scale_channels

# (blocks, base planes) per stage — ResNet-50: 3,4,6,3 bottlenecks
STAGES = [(3, 64), (4, 128), (6, 256), (3, 512)]
EXPANSION = 4


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _bottleneck(ctx: Ctx, name: str, x, planes: int, stride: int):
    cin = x.shape[-1]
    cout = planes * EXPANSION
    identity = x
    y = sconv(ctx, f"{name}/conv1", x, planes, kernel=1)
    if stride == 1:
        # pad 1 == SAME at stride 1, so the non-downsampling 3x3 is the same
        # BN+ReLU+conv chain as VGG's intra-block boundary: under
        # Ctx.fused_chain the normalized activation stays in VMEM
        # (ops/pallas/fused_chain.py); param names/order are identical
        y = fused_bn_relu_sconv(ctx, f"{name}/bn1", f"{name}/conv2", y,
                                planes)
    else:
        y = relu(batchnorm(ctx, f"{name}/bn1", y))
        # explicit pad 1 == torch Conv2d(padding=1); XLA "SAME" would pad
        # (0,1) at stride 2 and sample a shifted grid vs the ref weights
        y = sconv(ctx, f"{name}/conv2", y, planes, kernel=3, stride=stride,
                  padding=1)
    y = relu(batchnorm(ctx, f"{name}/bn2", y))
    y = sconv(ctx, f"{name}/conv3", y, cout, kernel=1)
    y = batchnorm(ctx, f"{name}/bn3", y)
    if stride != 1 or cin != cout:
        identity = sconv(ctx, f"{name}/downsample", x, cout, kernel=1,
                         stride=stride)
        identity = batchnorm(ctx, f"{name}/downsample_bn", identity)
    return relu(y + identity)


def resnet50(ctx: Ctx, x, num_classes: int, mult: float = 1.0):
    """x: (N, H, W, 3) NHWC (224x224 for the fine-grained configs)."""
    c1 = scale_channels(64, mult)
    x = sconv(ctx, "conv1", x, c1, kernel=7, stride=2, padding=[(3, 3), (3, 3)])
    x = relu(batchnorm(ctx, "bn1", x))
    x = _maxpool_3x3_s2(x)
    for si, (blocks, planes) in enumerate(STAGES):
        p = scale_channels(planes, mult)
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _bottleneck(ctx, f"layer{si + 1}/block{bi}", x, p, stride)
    x = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048*m)
    return head(ctx, "classifier", x, num_classes)
