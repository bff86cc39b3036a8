"""On-device magnitude pruner.

Reference semantics (ref:pruner.py `SparsePruner._pruning_mask`,
`gradually_prune`, `one_shot_prune`):

  * per layer, collect |w| over entries with ownership == current task;
  * cutoff rank = round(ratio * n_owned)  (1-indexed k-th smallest, round
    half-to-even, matching python round / torch kthvalue usage);
  * prune entries with |w| <= cutoff AND ownership == current task — note the
    `<=`: ties at the cutoff value are all pruned;
  * pruned entries: ownership -> 0 (released) and weight -> 0
    (ref `make_pruned_zero`).

The reference runs this host-side (cpu sort per layer per prune event). Here
the whole selection — sort, rank, cutoff, rewrite — is jnp inside jit, so a
prune event costs one fused device program and the ratio can be a traced
scalar (no recompile per ratio).

Gradual pruning bookkeeping: the cubic schedule's sparsity target s(t) is a
fraction of the task's weight count AT THE START of the prune phase (n0). As
entries get released, the owned pool shrinks; we therefore prune
`round(s(t) * n0) - (n0 - n_now)` additional entries at each event, smallest
magnitude first. This matches the reference's monotone schedule exactly when
events fire in order.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ownership import FREE, owned_mask


def _kth_smallest(values: jax.Array, valid: jax.Array, rank: jax.Array) -> jax.Array:
    """k-th smallest (1-indexed `rank`) of `values` over `valid` entries.

    Deterministic total order: invalid entries sort to +inf. rank < 1 yields
    -inf (prune nothing).
    """
    keyed = jnp.where(valid, values, jnp.inf).ravel()
    s = jnp.sort(keyed)
    idx = jnp.clip(rank - 1, 0, s.size - 1)
    cutoff = jax.lax.dynamic_index_in_dim(s, idx, keepdims=False)
    return jnp.where(rank < 1, -jnp.inf, cutoff)


def prune_layer_by_count(w, own, task_id, n_prune):
    """Release the `n_prune` smallest-|w| entries owned by `task_id`.

    Ties at the cutoff magnitude are all released (reference `<=` semantics).
    Returns (w', own').
    """
    owned = owned_mask(own, task_id)
    cutoff = _kth_smallest(jnp.abs(w), owned, jnp.asarray(n_prune, jnp.int32))
    remove = owned & (jnp.abs(w) <= cutoff)
    own2 = jnp.where(remove, jnp.asarray(FREE, own.dtype), own)
    w2 = jnp.where(remove, jnp.zeros((), w.dtype), w)
    return w2, own2


def prune_layer_by_ratio(w, own, task_id, ratio):
    """One-shot prune: release round(ratio * n_owned_now) smallest entries."""
    n_owned = owned_mask(own, task_id).sum()
    rank = jnp.round(jnp.asarray(ratio, jnp.float32) * n_owned).astype(jnp.int32)
    return prune_layer_by_count(w, own, task_id, rank)


def prune_layer_to_total(w, own, task_id, target_sparsity, n0):
    """Gradual-prune step: reach `target_sparsity` of the snapshot count `n0`.

    n0 = owned count at prune-phase start for this layer. Already-released
    entries count toward the target; only the shortfall is pruned now.
    """
    n_now = owned_mask(own, task_id).sum()
    pruned_so_far = jnp.asarray(n0, jnp.int32) - n_now.astype(jnp.int32)
    want_total = jnp.round(
        jnp.asarray(target_sparsity, jnp.float32) * jnp.asarray(n0, jnp.float32)
    ).astype(jnp.int32)
    n_prune = jnp.maximum(want_total - pruned_so_far, 0)
    return prune_layer_by_count(w, own, task_id, n_prune)


# ---------------------------------------------------------------------------
# Pytree-level wrappers (one call per prune event, applied to every layer).
# ---------------------------------------------------------------------------


def snapshot_owned_counts(ownership: Dict, task_id) -> Dict:
    return jax.tree.map(
        lambda m: owned_mask(m, task_id).sum().astype(jnp.int32), ownership
    )


def one_shot_prune(shared: Dict, ownership: Dict, task_id, ratio) -> Tuple[Dict, Dict]:
    out = jax.tree.map(
        lambda w, m: prune_layer_by_ratio(w, m, task_id, ratio), shared, ownership
    )
    shared2 = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    own2 = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return shared2, own2


def gradual_prune(shared, ownership, task_id, target_sparsity, n0_counts):
    out = jax.tree.map(
        lambda w, m, n0: prune_layer_to_total(w, m, task_id, target_sparsity, n0),
        shared,
        ownership,
        n0_counts,
    )
    shared2 = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    own2 = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return shared2, own2


def task_sparsity(ownership, task_id, n0_counts) -> jax.Array:
    """Achieved sparsity vs the snapshot counts (for logging/records)."""
    now = jax.tree.leaves(
        jax.tree.map(lambda m: owned_mask(m, task_id).sum(), ownership)
    )
    n0 = jax.tree.leaves(n0_counts)
    n_now = sum(now)
    n_tot = sum(jnp.asarray(x, jnp.float32) for x in n0)
    return 1.0 - n_now / jnp.maximum(n_tot, 1.0)
