"""Shared test fixtures: a tiny CNN arch + synthetic task data."""

import numpy as np

from cpg_tpu.models import REGISTRY, framework as fw
from cpg_tpu.models.framework import batchnorm, head, maxpool, relu, sconv


def tiny_cnn(ctx, x, num_classes, mult=1.0):
    """2-conv CNN on 16x16 inputs — fast enough for CPU e2e tests."""
    c1, c2 = max(1, int(8 * mult)), max(1, int(16 * mult))
    x = sconv(ctx, "features/conv0", x, c1, kernel=3)
    x = batchnorm(ctx, "features/bn0", x)
    x = relu(x)
    x = maxpool(x)
    x = sconv(ctx, "features/conv1", x, c2, kernel=3)
    x = batchnorm(ctx, "features/bn1", x)
    x = relu(x)
    x = x.mean(axis=(1, 2))
    return head(ctx, "classifier", x, num_classes)


if "tiny_cnn" not in REGISTRY:
    REGISTRY["tiny_cnn"] = (tiny_cnn, (16, 16, 3))


def tiny_vit(ctx, x, num_classes, mult=1.0):
    """2-block ViT on 16x16 inputs (4 tokens) — CPU-fast transformer arch.

    Registered as its own arch (not model_kwargs) because depth/dim/heads
    change SHARED shapes, and grow_state re-inits shared shapes from the
    registry entry alone."""
    from cpg_tpu.models.vit import vit_cifar

    return vit_cifar(ctx, x, num_classes, mult, depth=2, dim=32, heads=2,
                     patch=8)


if "tiny_vit" not in REGISTRY:
    REGISTRY["tiny_vit"] = (tiny_vit, (16, 16, 3))


def tiny_moe(ctx, x, num_classes, mult=1.0):
    """2-block MoE-ViT on 16x16 inputs (block 1's FFN = 4 experts) — the
    expert-parallel arch at CPU-test scale (models/moe.py)."""
    from cpg_tpu.models.moe import vit_moe_cifar

    return vit_moe_cifar(ctx, x, num_classes, mult, depth=2, dim=32,
                         heads=2, patch=8, n_experts=4)


if "tiny_moe" not in REGISTRY:
    REGISTRY["tiny_moe"] = (tiny_moe, (16, 16, 3))


def normalize01(x):
    import jax.numpy as jnp

    return x.astype(jnp.float32) / 255.0 - 0.5


def norm_augment(x, rng):
    return normalize01(x)


def synthetic_task(seed, num_classes=4, n_train=256, n_test=64, hw=16):
    """Gaussian-blob classification task, learnable by tiny_cnn in a few epochs."""
    rng = np.random.RandomState(seed)
    protos = rng.randn(num_classes, hw, hw, 3).astype(np.float32) * 3.0

    def make(n):
        y = rng.randint(0, num_classes, n).astype(np.int32)
        x = protos[y] + rng.randn(n, hw, hw, 3).astype(np.float32)
        # FIXED affine quantization — a data-dependent min/ptp would give the
        # train and test splits different contrast (covariate shift that BN
        # running stats can't absorb)
        x = np.clip((x + 12.0) / 24.0 * 255.0, 0, 255).astype(np.uint8)
        return x, y

    tx, ty = make(n_train)
    vx, vy = make(n_test)
    return {"train_x": tx, "train_y": ty, "test_x": vx, "test_y": vy,
            "num_classes": num_classes}


def tiny_textcls(ctx, x, num_classes, mult=1.0):
    """2-block text transformer, 16-token sequences — CPU-fast."""
    from cpg_tpu.models.text import textcls

    return textcls(ctx, x, num_classes, mult, depth=2, dim=32, heads=2,
                   vocab=64, causal=True)


if "tiny_textcls" not in REGISTRY:
    REGISTRY["tiny_textcls"] = (tiny_textcls, (16,))


def ident_augment(x, rng):
    return x
