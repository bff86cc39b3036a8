"""Golden parity: a full NumPy simulation of the reference's mask-selection
semantics over a multi-event gradual schedule must produce BIT-IDENTICAL
ownership masks to the jitted pipeline (SURVEY §7 'hard parts': selection must
be rule-identical, not just accuracy-equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core import pruner
from cpg_tpu.core.ownership import OWN_DTYPE
from cpg_tpu.core.schedule import cubic_sparsity
from cpg_tpu.ops.binarize import DEFAULT_THRESHOLD
from cpg_tpu.ops.masked import effective_kernel


class NumpyCPG:
    """Reference-semantics simulator (ref:pruner.py + models/layers.py)."""

    @staticmethod
    def cubic(step, t0, t1, si, sf):
        p = min(max((step - t0) / max(t1 - t0, 1), 0.0), 1.0)
        return sf + (si - sf) * (1 - p) ** 3

    @staticmethod
    def prune_to_total(w, own, tid, target, n0):
        n_now = int((own == tid).sum())
        pruned = n0 - n_now
        want = int(np.round(target * n0))
        n_prune = max(want - pruned, 0)
        if n_prune < 1:
            return w, own
        vals = np.abs(w[own == tid])
        cutoff = np.sort(vals)[n_prune - 1]
        rm = (own == tid) & (np.abs(w) <= cutoff)
        w = np.where(rm, 0.0, w)
        own = np.where(rm, 0, own).astype(own.dtype)
        return w, own

    @staticmethod
    def effective(w, own, pm, tid, thr=DEFAULT_THRESHOLD):
        binm = (pm > thr).astype(w.dtype)
        return np.where(own == tid, w,
                        np.where((own > 0) & (own < tid), binm * w, 0.0))


def test_gradual_schedule_selection_bit_identical():
    rng = np.random.RandomState(42)
    w_np = rng.randn(96, 77).astype(np.float32)
    own_np = np.ones((96, 77), np.int8)

    w_jx = jnp.asarray(w_np)
    own_jx = jnp.asarray(own_np)
    n0 = int(own_np.sum())
    n0_jx = pruner.snapshot_owned_counts({"l": own_jx}, 1)

    # a realistic prune window: cubic 0 -> 0.75 over steps 0..100, event /10
    for step in range(0, 101, 10):
        target_np = NumpyCPG.cubic(step, 0, 100, 0.0, 0.75)
        target_jx = cubic_sparsity(step, 0, 100, 0.0, 0.75)
        np.testing.assert_allclose(target_np, float(target_jx), rtol=1e-6)
        w_np, own_np = NumpyCPG.prune_to_total(w_np, own_np, 1, target_np, n0)
        sh, ow = pruner.gradual_prune({"l": w_jx}, {"l": own_jx}, 1,
                                      target_jx, n0_jx)
        w_jx, own_jx = sh["l"], ow["l"]
        # ownership masks BIT-IDENTICAL after every event
        np.testing.assert_array_equal(own_np, np.array(own_jx))
        np.testing.assert_array_equal(w_np == 0, np.array(w_jx) == 0)

    achieved = 1 - own_np.sum() / n0
    assert abs(achieved - 0.75) < 1e-3


def test_effective_weight_golden_multi_task():
    rng = np.random.RandomState(7)
    w = rng.randn(64, 64).astype(np.float32)
    own = rng.choice([0, 1, 2, 3, 4], size=(64, 64)).astype(np.int8)
    pm = (rng.randn(64, 64) * 0.01).astype(np.float32)
    for tid in (1, 2, 3, 4, 5):
        want = NumpyCPG.effective(w, own, pm, tid)
        got = effective_kernel(jnp.asarray(w), jnp.asarray(own),
                               jnp.asarray(pm), tid)
        np.testing.assert_array_equal(want, np.array(got))


def test_jit_and_eager_selection_agree():
    """XLA reduction order must not flip selected sets: jit vs eager prune."""
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(128, 130).astype(np.float32))
    own = jnp.ones((128, 130), OWN_DTYPE)
    eager = pruner.prune_layer_by_ratio(w, own, 1, 0.37)
    jitted = jax.jit(lambda w, o: pruner.prune_layer_by_ratio(w, o, 1, 0.37))(
        w, own)
    np.testing.assert_array_equal(np.array(eager[1]), np.array(jitted[1]))


def test_fuzz_selection_bit_identical():
    """Randomized sweep of the NumPy reference simulator vs the jitted
    pruner: random shapes (2D and 4D), mixed multi-task ownership, random
    targets/ratios, and INJECTED MAGNITUDE TIES (quantized weights) — the
    tie-at-cutoff rule (`|w| <= cutoff` releases all) and round-half-even
    rank must hold bit-identically over the whole space, not just the
    hand-picked golden cases."""
    checked = 0
    for trial in range(40):
        rng = np.random.RandomState(1000 + trial)
        nd = 2 if trial % 2 else 4
        shape = tuple(int(s) for s in rng.randint(2, 13, size=nd))
        w = rng.randn(*shape).astype(np.float32)
        if trial % 3 == 0:  # force heavy magnitude ties at the cutoff
            w = (np.round(w, 1) + 0.0).astype(np.float32)
        own = rng.choice([0, 1, 2, 3], size=shape,
                         p=[0.15, 0.25, 0.45, 0.15]).astype(np.int8)
        tid = 2
        n0 = int((own == tid).sum())
        if n0 < 2:
            continue
        # gradual event to a random total-sparsity target
        target = float(rng.uniform(0.02, 0.95))
        w_np, own_np = NumpyCPG.prune_to_total(w.copy(), own.copy(), tid,
                                               target, n0)
        sh, ow = pruner.gradual_prune(
            {"l": jnp.asarray(w)}, {"l": jnp.asarray(own)}, tid,
            jnp.float32(target),
            pruner.snapshot_owned_counts({"l": jnp.asarray(own)}, tid))
        np.testing.assert_array_equal(own_np, np.asarray(ow["l"]),
                                      err_msg=f"gradual trial {trial}")
        np.testing.assert_array_equal(w_np == 0, np.asarray(sh["l"]) == 0,
                                      err_msg=f"gradual zeros trial {trial}")
        # one-shot at a random ratio (round-half-even rank; <=cutoff ties)
        ratio = float(rng.uniform(0.0, 1.0))
        k = int(np.round(ratio * n0))
        if k >= 1:
            cutoff = np.sort(np.abs(w[own == tid]))[k - 1]
            rm = (own == tid) & (np.abs(w) <= cutoff)
        else:
            rm = np.zeros(shape, bool)
        own_os = np.where(rm, 0, own).astype(np.int8)
        sh2, ow2 = pruner.one_shot_prune(
            {"l": jnp.asarray(w)}, {"l": jnp.asarray(own)}, tid,
            jnp.float32(ratio))
        np.testing.assert_array_equal(own_os, np.asarray(ow2["l"]),
                                      err_msg=f"one-shot trial {trial} "
                                              f"ratio={ratio} k={k}")
        checked += 1
    assert checked >= 30  # the sweep must actually exercise the space
