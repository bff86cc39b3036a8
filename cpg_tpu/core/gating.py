"""Gradient gating + selective weight decay, fused into the train step.

Reference semantics (ref:pruner.py `do_weight_decay_and_make_grads_zero`):
after backward, for every sharable weight

  * zero the gradient wherever ownership != current task (prior-task weights
    are bit-frozen; free weights don't exist during training because
    `make_finetuning_mask` assigned them), and
  * add weight decay `wd * w` ONLY on current-task entries (decaying frozen
    weights would corrupt old tasks).

The reference does this as an eager Python sweep over all parameters every
step; here it is a pure function composed into the jitted step, so XLA fuses
it with the optimizer update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ownership import owned_mask


def gate_and_decay(grads, shared, ownership, task_id, weight_decay: float):
    def one(g, w, m):
        owned = owned_mask(m, task_id)
        g = g + jnp.asarray(weight_decay, g.dtype) * w.astype(g.dtype)
        return jnp.where(owned, g, jnp.zeros((), g.dtype))

    return jax.tree.map(one, grads, shared, ownership)


def gate_piggymask_grads(pm_grads, ownership, task_id):
    """Zero piggymask grads outside the prior-task domain (entries owned by
    the current task or free receive no mask gradient — they pass unmasked)."""
    from .ownership import prior_mask

    return jax.tree.map(
        lambda g, m: jnp.where(prior_mask(m, task_id), g, jnp.zeros((), g.dtype)),
        pm_grads,
        ownership,
    )
