"""Ownership masks: the single bookkeeping tensor that drives CPG.

Reference semantics (ref:pruner.py `SparsePruner`): every sharable weight
tensor has an integer mask of identical shape; entry value 0 means the weight
is free (never assigned, or pruned/released), value k>0 means it is owned by
task k. Ownership drives

  * pruning eligibility  — only `mask == current_task` entries may be pruned,
  * gradient gating      — only `mask == current_task` entries receive grads,
  * inference visibility — task t sees entries with `0 < mask <= t`.

TPU-native design: masks are int8 jnp arrays stored in a pytree parallel to
the shared-weight pytree; every transition below is a pure jittable function.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

OWN_DTYPE = jnp.int8
FREE = 0


def init_ownership(shared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """All-free masks matching the shared-weight pytree."""
    return jax.tree.map(lambda w: jnp.zeros(w.shape, OWN_DTYPE), shared)


def assign_free_to_task(ownership, task_id: int):
    """ref:pruner.py `make_finetuning_mask`: every free entry becomes owned by
    `task_id` (the new task trains the released/never-used capacity)."""
    tid = jnp.asarray(task_id, OWN_DTYPE)
    return jax.tree.map(lambda m: jnp.where(m == FREE, tid, m), ownership)


def visible_mask(own: jax.Array, task_id) -> jax.Array:
    """Boolean: entries a forward pass for `task_id` may use
    (ref:pruner.py `apply_mask`: zero out weights with mask==0 or mask>t)."""
    return (own > FREE) & (own <= jnp.asarray(task_id, own.dtype))


def owned_mask(own: jax.Array, task_id) -> jax.Array:
    return own == jnp.asarray(task_id, own.dtype)


def prior_mask(own: jax.Array, task_id) -> jax.Array:
    """Entries owned by strictly earlier tasks (piggymask domain)."""
    tid = jnp.asarray(task_id, own.dtype)
    return (own > FREE) & (own < tid)


# ---------------------------------------------------------------------------
# Statistics (ref:pruner.py calculate_sparsity / curr_task_ratio / zero_ratio /
# shared_part_ratio) — jittable scalars.
# ---------------------------------------------------------------------------


def _frac(pred_tree) -> jax.Array:
    counts = jax.tree.map(lambda p: (p.sum(), p.size), pred_tree)
    leaves = jax.tree.leaves(counts, is_leaf=lambda x: isinstance(x, tuple))
    num = sum(c for c, _ in leaves)
    den = sum(n for _, n in leaves)
    return num / jnp.maximum(den, 1)


def free_ratio(ownership) -> jax.Array:
    """Fraction of all shared weights currently free (== available capacity)."""
    return _frac(jax.tree.map(lambda m: m == FREE, ownership))


def task_ratio(ownership, task_id) -> jax.Array:
    """Fraction of all shared weights owned by `task_id`."""
    return _frac(jax.tree.map(lambda m: owned_mask(m, task_id), ownership))


def used_ratio(ownership) -> jax.Array:
    return _frac(jax.tree.map(lambda m: m > FREE, ownership))
