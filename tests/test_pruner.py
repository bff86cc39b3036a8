"""Magnitude pruner semantics vs a NumPy golden re-implementation of the
reference rule (ref:pruner.py `_pruning_mask`: cutoff = k-th smallest |w| over
owned entries, k = round(ratio*n); prune owned entries with |w| <= cutoff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core import pruner
from cpg_tpu.core.ownership import FREE, OWN_DTYPE
from cpg_tpu.core.schedule import cubic_sparsity, is_prune_step


def golden_prune(w, own, task_id, ratio):
    """NumPy re-implementation of the reference selection rule."""
    w = np.asarray(w)
    own = np.asarray(own)
    owned = own == task_id
    vals = np.abs(w[owned])
    n = vals.size
    rank = int(np.round(ratio * n))
    if rank < 1:
        return w.copy(), own.copy()
    cutoff = np.sort(vals)[rank - 1]
    remove = owned & (np.abs(w) <= cutoff)
    w2 = np.where(remove, 0.0, w)
    own2 = np.where(remove, FREE, own)
    return w2, own2


@pytest.mark.parametrize("ratio", [0.0, 0.1, 0.3333, 0.5, 0.9, 1.0])
def test_prune_matches_golden(ratio):
    rng = np.random.RandomState(0)
    w = rng.randn(7, 13).astype(np.float32)
    own = rng.choice([0, 1, 2], size=(7, 13)).astype(np.int8)
    w2, own2 = pruner.prune_layer_by_ratio(
        jnp.array(w), jnp.array(own), 2, jnp.float32(ratio)
    )
    gw, gown = golden_prune(w, own, 2, ratio)
    np.testing.assert_array_equal(np.array(own2), gown)
    np.testing.assert_array_equal(np.array(w2), gw)


def test_tie_behavior_prunes_all_at_cutoff():
    # three entries share the cutoff magnitude -> all pruned (<= rule)
    w = jnp.array([0.1, 0.1, 0.1, 0.5, 0.9])
    own = jnp.ones(5, OWN_DTYPE)
    w2, own2 = pruner.prune_layer_by_ratio(w, own, 1, 0.2)  # rank=1 -> cutoff=0.1
    np.testing.assert_array_equal(np.array(own2), [0, 0, 0, 1, 1])
    np.testing.assert_allclose(np.array(w2), [0, 0, 0, 0.5, 0.9], rtol=1e-6)


def test_prune_only_touches_current_task():
    w = jnp.array([[0.01, 0.02], [0.03, 0.04]])
    own = jnp.array([[1, 2], [1, 2]], OWN_DTYPE)
    w2, own2 = pruner.prune_layer_by_ratio(w, own, 2, 1.0)
    # task-1 entries untouched even though their |w| is tiny
    np.testing.assert_array_equal(np.array(own2), [[1, 0], [1, 0]])
    np.testing.assert_allclose(np.array(w2), [[0.01, 0.0], [0.03, 0.0]], rtol=1e-6)


def test_gradual_prune_reaches_target_of_snapshot():
    rng = np.random.RandomState(1)
    w = jnp.array(rng.randn(64, 64).astype(np.float32))
    own = jnp.ones((64, 64), OWN_DTYPE)
    shared = {"l/kernel": w}
    ownership = {"l/kernel": own}
    n0 = pruner.snapshot_owned_counts(ownership, 1)
    assert int(n0["l/kernel"]) == 64 * 64
    # three events walking sparsity 0.3 -> 0.6 -> 0.75
    for s in [0.3, 0.6, 0.75]:
        shared, ownership = pruner.gradual_prune(shared, ownership, 1, s, n0)
        achieved = float(pruner.task_sparsity(ownership, 1, n0))
        assert abs(achieved - s) < 2e-3  # exact up to magnitude ties
    # monotone: pruned entries stay zero & free
    assert int((ownership["l/kernel"] == 0).sum()) == round(0.75 * 64 * 64)


def test_gradual_prune_jits_with_traced_ratio():
    w = jnp.array(np.random.RandomState(2).randn(32, 32).astype(np.float32))
    own = jnp.ones((32, 32), OWN_DTYPE)
    f = jax.jit(
        lambda w, m, s: pruner.prune_layer_to_total(w, m, 1, s, 32 * 32)
    )
    w2, own2 = f(w, own, jnp.float32(0.5))
    assert int((own2 == 0).sum()) == 512


def test_cubic_schedule():
    # endpoints and monotonicity
    assert float(cubic_sparsity(0, 0, 100, 0.0, 0.8)) == 0.0
    assert abs(float(cubic_sparsity(100, 0, 100, 0.0, 0.8)) - 0.8) < 1e-6
    vals = [float(cubic_sparsity(t, 0, 100, 0.0, 0.8)) for t in range(0, 101, 10)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    # clamps outside window
    assert abs(float(cubic_sparsity(500, 0, 100, 0.0, 0.8)) - 0.8) < 1e-6
    # half-way value of the cubic: sf + (si-sf)(1-0.5)^3 = 0.8 * (1 - 0.125)
    assert abs(float(cubic_sparsity(50, 0, 100, 0.0, 0.8)) - 0.8 * 0.875) < 1e-6


def test_is_prune_step():
    hits = [int(is_prune_step(t, 10, 50, 10)) for t in range(60)]
    assert [t for t, h in enumerate(hits) if h] == [10, 20, 30, 40, 50]
