"""Device-side image preprocessing, fused into the jitted train step.

Reference semantics (ref:utils/dataset.py transforms):
  CIFAR train: RandomCrop(32, padding=4, zero pad) + RandomHorizontalFlip +
               Normalize(CIFAR-100 stats); eval: Normalize only.
  Fine-grained train: RandomResizedCrop(224)+HFlip+ImageNet stats (we use
               Resize+RandomCrop as the deterministic-shape TPU variant).
  Face: 112x96 aligned crops, (x - 127.5) / 128, random horizontal flip.

TPU-native design: the reference does this on host CPU in DataLoader workers
(PIL per image). Here batches arrive as uint8 device arrays and the whole
augmentation — pad, per-sample dynamic-slice crop, flip, normalize — runs
inside the train step as vectorized XLA ops, so input prep never stalls the
MXU (north-star: "image preprocessing front-end fused ahead of the step").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# CIFAR-100 channel statistics (torchvision-convention, ref:utils/dataset.py)
CIFAR100_MEAN = (0.5071, 0.4865, 0.4409)
CIFAR100_STD = (0.2673, 0.2564, 0.2762)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(x_f32, mean, std):
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (x_f32 - m) / s


def _random_crop_flip(x, rng, pad: int):
    """Per-sample zero-pad random crop + horizontal flip. x: (N,H,W,C) f32.

    TPU note: the obvious vmap(dynamic_slice) crop is gather-bound and
    measured 28 ms/step at batch 1024 (60%% of the whole VGG16 train step).
    Instead the crop is two batched one-hot selection matmuls — dense MXU
    work (~1 GFLOP at batch 1024), which XLA fuses and runs in <2 ms."""
    n, h, w, c = x.shape
    kc, kf = jax.random.split(rng)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offs = jax.random.randint(kc, (n, 2), 0, 2 * pad + 1)

    hp, wp = h + 2 * pad, w + 2 * pad
    out_r = jax.lax.broadcasted_iota(jnp.int32, (n, h, hp), 1)
    src_r = jax.lax.broadcasted_iota(jnp.int32, (n, h, hp), 2)
    sel_r = (src_r == out_r + offs[:, 0, None, None]).astype(x.dtype)
    out_c = jax.lax.broadcasted_iota(jnp.int32, (n, w, wp), 1)
    src_c = jax.lax.broadcasted_iota(jnp.int32, (n, w, wp), 2)
    sel_c = (src_c == out_c + offs[:, 1, None, None]).astype(x.dtype)

    # rows: (n,hp,wp,c) x (n,h,hp) -> (n,h,wp,c); then columns likewise.
    # Exactness: callers crop RAW 0..255 values (integers <= 255 are exact in
    # bf16, and each output pixel is a single 1*value product), so the MXU's
    # fast default precision reproduces the slice bit-exactly. Cropping
    # post-normalization would need precision='highest' (non-integer pixels).
    x = jnp.einsum("nIWc,niI->niWc", xp, sel_r)
    x = jnp.einsum("niJc,njJ->nijc", x, sel_c)

    flip = jax.random.bernoulli(kf, 0.5, (n, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def cifar_train_augment(x_uint8, rng):
    x = _random_crop_flip(x_uint8.astype(jnp.float32), rng, pad=4) / 255.0
    return normalize(x, CIFAR100_MEAN, CIFAR100_STD)


def cifar_eval_preprocess(x_uint8):
    return normalize(x_uint8.astype(jnp.float32) / 255.0, CIFAR100_MEAN, CIFAR100_STD)


def imagenet_train_augment(x_uint8, rng, pad: int = 16):
    """Fine-grained 224x224 path: pad-crop + flip + ImageNet stats."""
    x = _random_crop_flip(x_uint8.astype(jnp.float32), rng, pad=pad) / 255.0
    return normalize(x, IMAGENET_MEAN, IMAGENET_STD)


def imagenet_eval_preprocess(x_uint8):
    return normalize(x_uint8.astype(jnp.float32) / 255.0, IMAGENET_MEAN, IMAGENET_STD)


def face_train_augment(x_uint8, rng):
    """Face crops: (x - 127.5) / 128 + random flip (ref:CPG_face_main.py)."""
    x = (x_uint8.astype(jnp.float32) - 127.5) / 128.0
    n = x.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (n, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def face_eval_preprocess(x_uint8):
    return (x_uint8.astype(jnp.float32) - 127.5) / 128.0


AUGMENTS = {
    "cifar": (cifar_train_augment, cifar_eval_preprocess),
    "imagenet": (imagenet_train_augment, imagenet_eval_preprocess),
    "face": (face_train_augment, face_eval_preprocess),
}
