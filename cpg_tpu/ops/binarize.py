"""Straight-through binarizer / ternarizer for piggyback masks.

Reference semantics (ref:models/layers.py — `Binarizer`, `Ternarizer`
torch.autograd.Function): forward thresholds the real-valued piggymask at
DEFAULT_THRESHOLD (5e-3) to {0, 1}; backward is the identity (straight-through
estimator), so gradients reach sub-threshold entries — this is what lets the
"picking" stage turn old weights on and off.

TPU-native design: `jax.custom_vjp` instead of an autograd.Function. The
forward is a pure elementwise compare that XLA fuses into the surrounding
masked-weight computation; the backward passes the cotangent through
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ref:models/layers.py DEFAULT_THRESHOLD
DEFAULT_THRESHOLD = 5e-3


@jax.custom_vjp
def binarize(mask: jax.Array, threshold: float = DEFAULT_THRESHOLD) -> jax.Array:
    """Hard threshold with straight-through gradient.

    forward:  out = 1.0 where mask > threshold else 0.0
    backward: d mask = d out   (identity; STE)
    """
    return (mask > threshold).astype(mask.dtype)


def _binarize_fwd(mask, threshold):
    return binarize(mask, threshold), None


def _binarize_bwd(_, g):
    # Straight-through: gradient flows unchanged to the real-valued mask.
    return (g, None)


binarize.defvjp(_binarize_fwd, _binarize_bwd)


@jax.custom_vjp
def ternarize(mask: jax.Array, threshold: float = DEFAULT_THRESHOLD) -> jax.Array:
    """Ternary variant (ref:models/layers.py `Ternarizer`).

    forward:  out = -1 where mask < 0, +1 where mask > threshold, else 0
    backward: identity (STE)
    """
    out = jnp.where(mask < 0, -1.0, jnp.where(mask > threshold, 1.0, 0.0))
    return out.astype(mask.dtype)


def _ternarize_fwd(mask, threshold):
    return ternarize(mask, threshold), None


def _ternarize_bwd(_, g):
    return (g, None)


ternarize.defvjp(_ternarize_fwd, _ternarize_bwd)


# Default real-valued piggymask initialization (ref: piggymask creation in
# CPG_*_main*.py: masks start at 1e-2, i.e. above threshold -> all prior
# weights initially "picked").
PIGGYMASK_INIT = 1e-2


def init_piggymask(shape, dtype=jnp.float32) -> jax.Array:
    return jnp.full(shape, PIGGYMASK_INIT, dtype=dtype)
