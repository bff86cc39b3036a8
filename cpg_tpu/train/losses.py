"""Losses: cross-entropy (CIFAR/fine-grained) and A-Softmax AngleLoss (face).

Reference: CE via nn.CrossEntropyLoss in ref:CPG_cifar100_main_normal.py /
CPG_imagenet_main.py; AngleLoss (SphereFace A-Softmax, m=4, annealed lambda)
in ref:CPG_face_main.py / models/spherenet.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def accuracy(logits, labels):
    return (jnp.argmax(logits, axis=-1) == labels).mean()


def angle_loss(cos_theta, phi_theta, labels, it, lambda_min=5.0, lambda_base=1500.0,
               gamma=0.12, power=1.0):
    """SphereFace A-Softmax annealed loss (ref:models/spherenet.py AngleLoss).

    cos_theta: (N, C) cosine logits scaled by ||x||;
    phi_theta: (N, C) psi(theta) margin logits scaled by ||x||;
    blended output on the target class: (cos + lamb*cos -> anneal toward phi):
        f_y = (lambda * cos_y + phi_y) / (1 + lambda)
    """
    lamb = jnp.maximum(lambda_min, lambda_base / (1.0 + gamma * it) ** power)
    onehot = jax.nn.one_hot(labels, cos_theta.shape[-1], dtype=cos_theta.dtype)
    blended = cos_theta - onehot * cos_theta / (1.0 + lamb) + onehot * phi_theta / (
        1.0 + lamb
    )
    logp = jax.nn.log_softmax(blended.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
