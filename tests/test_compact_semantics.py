"""Compact-loop semantics: candidate ratios are ABSOLUTE fractions of the
post-pick weights (not compounding across phases), and without explicit goals
the pick accuracy bounds how much compaction is accepted."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.ownership import owned_mask
from cpg_tpu.train.sequence import SequenceConfig, run_task, init_state
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def _owned_fraction(state, task_id):
    owned = sum(int(owned_mask(m, task_id).sum())
                for m in jax.tree.leaves(state.ownership))
    total = sum(m.size for m in jax.tree.leaves(state.ownership))
    return owned / total


def test_ratios_are_absolute_not_compounding():
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=8, prune_epochs=2, retrain_epochs=2,
                         prune_ratios=(0.3, 0.6), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0, lr_schedule="constant",
                         allow_acc_diff=0.25)  # generous: let 0.6 be accepted
    rep = run_task(state, "t1", data, cfg, seq, augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    # task 1 post-pick owned everything; chosen ratio r must leave ~(1-r)
    got = _owned_fraction(state, 1)
    want = 1.0 - rep.chosen_ratio
    assert abs(got - want) < 0.02, (
        f"ratio {rep.chosen_ratio}: owned fraction {got:.3f} != {want:.3f} "
        f"(compounding bug?)")


def test_restart_mode_ratios_absolute_from_post_pick():
    """Reference-faithful mode: every candidate ratio restarts from the
    post-pick checkpoint; ratios are absolute there too."""
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=8, prune_epochs=2, retrain_epochs=1,
                         prune_ratios=(0.3, 0.6), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0, lr_schedule="constant",
                         allow_acc_diff=0.25, compact_mode="restart")
    rep = run_task(state, "t1", data, cfg, seq, augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    got = _owned_fraction(state, 1)
    want = 1.0 - rep.chosen_ratio
    assert abs(got - want) < 0.02, (rep.chosen_ratio, got)
    assert set(rep.ratio_to_acc) == {0.3, 0.6}


def test_implicit_goal_rejects_collapsing_ratios():
    """With no explicit goal, a ratio that destroys accuracy (vs pick) must
    be rejected and the best prior state restored."""
    data = synthetic_task(0, n_train=192)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    # 0.995 prune with 1 retrain epoch collapses a tiny net's accuracy
    seq = SequenceConfig(finetune_epochs=8, prune_epochs=1, retrain_epochs=0,
                         prune_ratios=(0.2, 0.995), batch_size=32, lr=0.05,
                         prune_freq=3, seed=0, lr_schedule="constant",
                         allow_acc_diff=0.05)
    rep = run_task(state, "t1", data, cfg, seq, augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    assert rep.ratio_to_acc[0.995] < rep.pick_acc - 0.05  # it did collapse
    assert rep.chosen_ratio != 0.995, rep
    assert rep.final_acc >= rep.pick_acc - 0.0501
    # restored state matches the chosen ratio, not the collapsed one
    got = _owned_fraction(state, 1)
    assert got > 0.5, f"collapsed state leaked through: owned={got}"
