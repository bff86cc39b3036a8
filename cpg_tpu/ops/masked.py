"""Effective-weight computation: the heart of Sharable layers.

Reference semantics (ref:models/layers.py `SharableConv2d.forward` /
`SharableLinear.forward` + ref:pruner.py `apply_mask`): the weight a task-t
forward actually uses is

    w_eff = w                      on entries owned by t
          = binarize(piggymask)*w  on entries owned by tasks < t
          = 0                      on free entries and entries owned by tasks > t

TPU-native design: instead of embedding mask math inside each layer module
(three eager kernels per layer in the reference), we map `effective_kernel`
over the shared-weight pytree ONCE per step, producing an effective-params
pytree that the purely-functional model consumes. XLA fuses the compare /
select / multiply chain into a single elementwise kernel per weight; weight
reuse across the batch makes this strictly cheaper than re-masking per tile.
A fused Pallas masked-matmul path (cpg_tpu.ops.pallas) covers the case where
masking is folded directly into the MXU tile load.

Gradient flow: `binarize` is straight-through, so d(loss)/d(piggymask) reaches
sub-threshold entries; grads w.r.t. `w` on prior-task entries are nonzero here
and are explicitly gated to zero in the train step (ref:pruner.py
`do_weight_decay_and_make_grads_zero`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.ownership import FREE
from .binarize import DEFAULT_THRESHOLD, binarize, ternarize

MASK_FNS = {"binary": binarize, "ternary": ternarize}


def effective_kernel(
    w: jax.Array,
    own: jax.Array,
    piggymask: Optional[jax.Array],
    task_id,
    threshold: float = DEFAULT_THRESHOLD,
    mask_mode: str = "binary",
) -> jax.Array:
    """Per-layer effective weight for a task-`task_id` forward pass.

    mask_mode 'binary' (default, ref Binarizer), 'ternary' (ref Ternarizer:
    prior weights can also be picked with flipped sign), or 'packnet'
    (ref:packnet_cifar100_main.py: NO piggyback masks exist — every prior
    task's surviving weight is reused unmasked and frozen, so no per-task
    mask tensors are ever materialized)."""
    tid = jnp.asarray(task_id, own.dtype)
    owned_now = own == tid
    if mask_mode == "packnet":
        visible = (own > FREE) & (own <= tid)
        return jnp.where(visible, w, jnp.zeros((), w.dtype))
    if piggymask is None:
        # Task 1 (or no piggymask attached): only owned entries are visible.
        return jnp.where(owned_now, w, jnp.zeros((), w.dtype))
    prior = (own > FREE) & (own < tid)
    picked = MASK_FNS[mask_mode](piggymask, threshold).astype(w.dtype) * w
    return jnp.where(owned_now, w, jnp.where(prior, picked, jnp.zeros((), w.dtype)))


def effective_params(
    shared: Dict[str, jax.Array],
    ownership: Dict[str, jax.Array],
    piggymask: Optional[Dict[str, jax.Array]],
    task_id,
    threshold: float = DEFAULT_THRESHOLD,
    compute_dtype=None,
    mask_mode: str = "binary",
) -> Dict[str, jax.Array]:
    """Map `effective_kernel` over the whole shared pytree.

    `compute_dtype` optionally downcasts the masked weights (bf16 for the MXU)
    after masking in f32.
    """
    if piggymask is None or mask_mode == "packnet":
        eff = jax.tree.map(
            lambda w, m: effective_kernel(w, m, None, task_id, threshold,
                                          mask_mode),
            shared,
            ownership,
        )
    else:
        eff = jax.tree.map(
            lambda w, m, pm: effective_kernel(w, m, pm, task_id, threshold,
                                              mask_mode),
            shared,
            ownership,
            piggymask,
        )
    if compute_dtype is not None:
        eff = jax.tree.map(lambda w: w.astype(compute_dtype), eff)
    return eff
