"""Gradual sparsity schedule (Zhu & Gupta cubic), fully in-graph.

Reference semantics (ref:pruner.py `SparsePruner.gradually_prune`): during the
prune window [begin_step, end_step], the target sparsity at step t is

    s(t) = s_f + (s_i - s_f) * (1 - (t - t0) / (t1 - t0))**3

evaluated every `frequency` steps. Outside the window the schedule clamps to
its endpoint values. All math here is jnp so the schedule can live inside the
jitted train step (the reference recomputes it host-side every step).
"""

from __future__ import annotations

import jax.numpy as jnp


def cubic_sparsity(step, begin_step, end_step, initial_sparsity, final_sparsity):
    """Target *total* sparsity (fraction of task-owned weights pruned) at `step`."""
    step = jnp.asarray(step, jnp.float32)
    span = jnp.maximum(jnp.asarray(end_step - begin_step, jnp.float32), 1.0)
    progress = jnp.clip((step - begin_step) / span, 0.0, 1.0)
    si = jnp.asarray(initial_sparsity, jnp.float32)
    sf = jnp.asarray(final_sparsity, jnp.float32)
    return sf + (si - sf) * (1.0 - progress) ** 3


def is_prune_step(step, begin_step, end_step, frequency):
    """True on steps where a prune event fires (every `frequency` steps in window)."""
    step = jnp.asarray(step)
    in_window = (step >= begin_step) & (step <= end_step)
    on_freq = ((step - begin_step) % jnp.maximum(frequency, 1)) == 0
    return in_window & on_freq
