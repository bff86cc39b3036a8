"""Losses: cross-entropy (CIFAR/fine-grained) and A-Softmax AngleLoss (face).

Reference: CE via nn.CrossEntropyLoss in ref:CPG_cifar100_main_normal.py /
CPG_imagenet_main.py; AngleLoss (SphereFace A-Softmax, m=4, annealed lambda)
in ref:CPG_face_main.py / models/spherenet.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_logits(out):
    """Model outputs may be plain logits or an (cos_theta, phi_theta) tuple
    from an AngleLinear head — classification always uses the cosine part."""
    return out[0] if isinstance(out, tuple) else out


def call_loss(loss_fn, logits, labels, it):
    """Dispatch to loss_fn, passing the global step to losses that anneal
    (AngleLoss); plain losses take (logits, labels)."""
    if getattr(loss_fn, "wants_step", False):
        return loss_fn(logits, labels, it)
    return loss_fn(class_logits(logits), labels)


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def make_cross_entropy(label_smoothing: float = 0.0):
    """CE with uniform label smoothing: target = (1-eps)*onehot + eps/C.
    label_smoothing=0 returns the plain `cross_entropy`."""
    if not label_smoothing:
        return cross_entropy

    def loss(logits, labels):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
        uniform = -logp.mean()
        return (1.0 - label_smoothing) * nll + label_smoothing * uniform

    return loss


def accuracy(logits, labels):
    return (jnp.argmax(logits, axis=-1) == labels).mean()


def make_angle_loss(lambda_min=5.0, lambda_base=1500.0, gamma=0.12, power=1.0):
    """SphereFace A-Softmax annealed loss (ref:models/spherenet.py AngleLoss).

    The returned loss takes the AngleLinear head output
    (cos_theta, phi_theta) — both scaled by ||x|| — plus labels and the
    global step `it`; the margin term anneals in via
        lambda(it) = max(lambda_min, lambda_base / (1 + gamma*it)^power)
        f_y = (lambda * cos_y + phi_y) / (1 + lambda)
    """

    def loss(out, labels, it):
        cos_theta, phi_theta = out
        lamb = jnp.maximum(
            lambda_min, lambda_base / (1.0 + gamma * it) ** power)
        onehot = jax.nn.one_hot(labels, cos_theta.shape[-1],
                                dtype=cos_theta.dtype)
        blended = (cos_theta - onehot * cos_theta / (1.0 + lamb)
                   + onehot * phi_theta / (1.0 + lamb))
        logp = jax.nn.log_softmax(blended.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    loss.wants_step = True
    return loss
