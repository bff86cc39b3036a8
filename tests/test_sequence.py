"""Full CPG sequence driver: multi-task run with ratio->acc record + exact
retention of every earlier task (the reference's experiment1 loop in-process)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core.ownership import free_ratio
from cpg_tpu.inference import predict
from cpg_tpu.train.sequence import SequenceConfig, run_sequence
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn  # noqa: F401


def test_run_sequence_three_tasks(tmp_path):
    tasks = {
        "t1": synthetic_task(0),
        "t2": synthetic_task(5, num_classes=3),
        "t3": synthetic_task(9, num_classes=5),
    }
    cfg = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=6, prune_epochs=2, retrain_epochs=2,
        prune_ratios=(0.2, 0.4, 0.6), batch_size=32, lr=0.05,
        prune_freq=5, seed=0,
    )
    state, reports = run_sequence(
        "tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
        preprocess_fn=normalize01, record_dir=str(tmp_path),
    )

    assert [r.name for r in reports] == ["t1", "t2", "t3"]
    assert state.num_tasks == 3
    for r in reports:
        assert r.final_acc > 0.55, f"{r.name}: acc={r.final_acc}"
        assert r.ratio_to_acc, "ratio->acc record missing"
        assert r.chosen_ratio >= 0.2  # some compaction happened (no goal set)
    # record artifacts exist (public parity artifact)
    assert (tmp_path / "ratio_acc_t1.json").exists()

    # every task still owns weights; last task freed capacity for the future
    assert float(free_ratio(state.ownership)) > 0.05

    # retention: each task's current prediction matches a fresh eval (frozen)
    for tid, name in [(1, "t1"), (2, "t2"), (3, "t3")]:
        x = normalize01(jnp.asarray(tasks[name]["test_x"][:32]))
        y = tasks[name]["test_y"][:32]
        acc = float((np.argmax(np.array(predict(state, tid, x)), 1) == y).mean())
        assert acc > 0.5, f"task {name} forgotten: acc={acc}"


def test_goal_triggers_growth():
    # a goal no tiny run can reach forces the grow path; max mult caps it and
    # 'accept' policy takes best effort
    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(3, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=2, prune_epochs=1, retrain_epochs=1,
        prune_ratios=(0.2,), batch_size=32, lr=0.05, prune_freq=5,
        growth_step=0.5, max_width_mult=1.5, on_goal_miss="accept", seed=0,
    )
    state, reports = run_sequence(
        "tiny_cnn", tasks, cfg, seq, goals={"t2": 1.01},  # unreachable
        augment_fn=norm_augment, preprocess_fn=normalize01,
    )
    assert reports[1].grew >= 1
    assert state.width_mult == 1.5


def test_phase_granular_resume(tmp_path, monkeypatch):
    """Crash-mid-compact recovery: the post-pick checkpoint (taskNN.pick)
    must let run_sequence re-enter the COMPACT walk without redoing the pick
    phase (SURVEY §5: resumable at (task, phase) granularity)."""
    import shutil

    import cpg_tpu.train.sequence as S

    import cpg_tpu.utils.checkpoint as CK

    tasks = {"t1": synthetic_task(0)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=5, prune_epochs=1, retrain_epochs=1,
        prune_ratios=(0.3, 0.5), batch_size=32, lr=0.05, prune_freq=5,
        checkpoint_dir=str(tmp_path / "ck"))
    # a crash dies before the retire-flush runs; emulate by disabling it for
    # the first run so the .pick phase checkpoint survives like it would
    monkeypatch.setattr(CK, "_flush_removals", lambda: None)
    state, reports = run_sequence("tiny_cnn", tasks, cfg, seq,
                                  augment_fn=norm_augment,
                                  preprocess_fn=normalize01)
    monkeypatch.undo()
    CK._PENDING_RM.clear()  # the crash lost the in-memory retire queue too
    final = tmp_path / "ck" / "task01_t1"
    pick = tmp_path / "ck" / "task01_t1.pick"
    assert final.exists() and pick.exists()

    # simulate a crash AFTER pick, during compact: final checkpoint is gone
    shutil.rmtree(final)

    epochs_seen = []
    orig_train = S.Manager.train

    def spy(self, epochs, **kw):
        epochs_seen.append(epochs)
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", spy)
    state2, reports2 = run_sequence("tiny_cnn", tasks, cfg, seq,
                                    augment_fn=norm_augment,
                                    preprocess_fn=normalize01)
    # pick phase (finetune_epochs=5) must NOT re-run; only compact phases
    # (prune+retrain = 2 epochs per ratio) may appear
    assert epochs_seen and all(e == 2 for e in epochs_seen), epochs_seen
    assert reports2[0].pick_acc == reports[0].pick_acc  # carried via meta
    assert state2.num_tasks == 1
    # the resumed compact produces a working task (fresh optimizers are fine)
    x = normalize01(jnp.asarray(tasks["t1"]["test_x"][:32]))
    y = tasks["t1"]["test_y"][:32]
    acc = float((np.argmax(np.array(predict(state2, 1, x)), 1) == y).mean())
    assert acc > 0.5, acc
    # successful completion retires the superseded .pick checkpoint (it only
    # outlives the task when a crash prevents the final save from landing)
    assert final.exists() and not pick.exists()


def test_resume_survives_corrupt_checkpoint(tmp_path):
    """A crash can land mid-checkpoint-write; resume must treat an unreadable
    checkpoint as absent and redo that phase, never die on it."""
    import shutil

    tasks = {"t1": synthetic_task(0)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=3, prune_epochs=1, retrain_epochs=1,
                         prune_ratios=(0.3,), batch_size=32, lr=0.05,
                         prune_freq=5, checkpoint_dir=str(tmp_path / "ck"))
    run_sequence("tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    final = tmp_path / "ck" / "task01_t1"
    pick = tmp_path / "ck" / "task01_t1.pick"
    assert not pick.exists()  # retired once the final save landed
    # corrupt the final: meta survives, orbax tree gutted (mid-write crash
    # shape); with the .pick already retired, resume must redo the whole task
    shutil.rmtree(final / "tree")
    (final / "tree").mkdir()
    state2, reports2 = run_sequence("tiny_cnn", tasks, cfg, seq,
                                    augment_fn=norm_augment,
                                    preprocess_fn=normalize01)
    assert state2.num_tasks == 1 and reports2[0].final_acc > 0.5


def test_epoch_granular_resume(tmp_path, monkeypatch):
    """Kill mid-pick at epoch k: rerun must resume the pick at >= the last
    epoch-checkpoint multiple, not epoch 0 (VERDICT r2 #2, ref
    --restore_epoch). Crash is injected right after the epoch-4 checkpoint
    callback fires."""
    import cpg_tpu.train.sequence as S

    tasks = {"t1": synthetic_task(0)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=6, prune_epochs=1, retrain_epochs=1,
        prune_ratios=(0.3,), batch_size=32, lr=0.05, prune_freq=5,
        checkpoint_dir=str(tmp_path / "ck"), epoch_checkpoint_freq=2)

    class Crash(RuntimeError):
        pass

    orig_train = S.Manager.train

    def crashing(self, epochs, **kw):
        cb = kw.get("epoch_callback")
        if cb is not None:
            def bomb(completed):
                cb(completed)
                if completed == 4:
                    raise Crash(f"killed at epoch {completed}")
            kw["epoch_callback"] = bomb
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", crashing)
    with pytest.raises(Crash):
        run_sequence("tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
                     preprocess_fn=normalize01)
    monkeypatch.undo()
    assert (tmp_path / "ck" / "task01_t1.epoch").exists()

    # rerun: the pick must re-enter at epoch 4 (2 remaining), not epoch 0
    calls = []

    def spy(self, epochs, **kw):
        calls.append((epochs, kw.get("start_epoch", 0)))
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", spy)
    state2, reports2 = run_sequence("tiny_cnn", tasks, cfg, seq,
                                    augment_fn=norm_augment,
                                    preprocess_fn=normalize01)
    assert calls[0] == (6, 4), calls  # pick resumed at epoch 4
    assert all(s == 0 for _, s in calls[1:])  # compact phases from scratch
    assert reports2[0].final_acc > 0.5
    # transient phase checkpoints retired after the final save landed
    assert not (tmp_path / "ck" / "task01_t1.epoch").exists()
    assert not (tmp_path / "ck" / "task01_t1.pick").exists()
    assert "_epoch_resume" not in state2.tasks[1].meta


def test_growth_epoch_scale_widens_budgets(monkeypatch):
    """With growth_epoch_scale=1.0 a task that lands at mult 1.5 trains
    1.5x the base epochs in every phase (VERDICT r2 weak #6: fixed budgets
    under-fit post-growth tasks)."""
    import cpg_tpu.train.sequence as S

    calls = []
    orig_train = S.Manager.train

    def spy(self, epochs, **kw):
        calls.append(epochs)
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", spy)
    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(3, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=2, prune_epochs=1, retrain_epochs=1,
        prune_ratios=(0.2,), batch_size=32, lr=0.05, prune_freq=5,
        growth_step=0.5, max_width_mult=1.5, on_goal_miss="accept", seed=0,
        growth_epoch_scale=1.0)
    state, reports = run_sequence(
        "tiny_cnn", tasks, cfg, seq, goals={"t2": 1.01},  # unreachable
        augment_fn=norm_augment, preprocess_fn=normalize01)
    assert state.width_mult == 1.5 and reports[1].grew == 1
    # t1: pick 2, compact 2. t2: pick 2 (miss) -> grow -> pick 3 -> compact 3
    assert calls == [2, 2, 2, 3, 3], calls


def test_epoch_resume_mid_growth_retry(tmp_path, monkeypatch):
    """Crash during the RE-PICK at a grown width: the .epoch checkpoint
    carries {epoch, it, grew} and the grown state; resume must re-enter the
    grown pick (not restart at mult 1.0) and keep the grew counter."""
    import cpg_tpu.train.sequence as S

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(3, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=4, prune_epochs=1, retrain_epochs=1,
        prune_ratios=(0.2,), batch_size=32, lr=0.05, prune_freq=5,
        growth_step=0.5, max_width_mult=1.5, on_goal_miss="accept", seed=0,
        checkpoint_dir=str(tmp_path / "ck"), epoch_checkpoint_freq=1)

    class Crash(RuntimeError):
        pass

    orig_train = S.Manager.train

    def crashing(self, epochs, **kw):
        cb = kw.get("epoch_callback")
        # crash at epoch 2 of the SECOND pick attempt (grown width 1.5)
        if cb is not None and self.state.width_mult > 1.0:
            def bomb(completed):
                cb(completed)
                if completed == 2:
                    raise Crash("killed mid-grown-pick")
            kw["epoch_callback"] = bomb
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", crashing)
    with pytest.raises(Crash):
        run_sequence("tiny_cnn", tasks, cfg, seq, goals={"t2": 1.01},
                     augment_fn=norm_augment, preprocess_fn=normalize01)
    monkeypatch.undo()

    calls = []

    def spy(self, epochs, **kw):
        calls.append((self.state.width_mult, kw.get("start_epoch", 0)))
        return orig_train(self, epochs, **kw)

    monkeypatch.setattr(S.Manager, "train", spy)
    state, reports = run_sequence("tiny_cnn", tasks, cfg, seq,
                                  goals={"t2": 1.01},
                                  augment_fn=norm_augment,
                                  preprocess_fn=normalize01)
    # t1 resumed from its final checkpoint; t2's first train call resumes the
    # GROWN pick at epoch 2 — never back at mult 1.0
    assert calls[0] == (1.5, 2), calls
    assert state.width_mult == 1.5
    assert reports[1].grew == 1  # carried through the crash
    # the resumed model trains (compact-walk acc well above 3-class chance);
    # final_acc equals the pick acc here because the impossible goal makes
    # the walk keep the unpruned pick state (accept-best-effort semantics)
    assert reports[1].ratio_to_acc[0.2] > 0.5


def test_goal_miss_still_compacts_no_hoarding():
    """on_goal_miss='accept' must compact against the BEST-EFFORT accuracy
    when the goal was unreachable: with the old semantics the walk broke at
    the first ratio (< the impossible goal), chose ratio 0.0, and the task
    hoarded the ENTIRE free pool — every later task owned zero shared
    entries (the r4 Exp-1 starvation, RESULTS_r4_exp1.json)."""
    import numpy as np

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(3, num_classes=3),
             "t3": synthetic_task(5)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(
        finetune_epochs=3, prune_epochs=1, retrain_epochs=2,
        prune_ratios=(0.2, 0.4), batch_size=32, lr=0.05, prune_freq=5,
        growth_step=0.5, max_width_mult=1.5, on_goal_miss="accept", seed=0)
    state, reports = run_sequence(
        "tiny_cnn", tasks, cfg, seq, goals={"t2": 1.01},  # t2 unreachable
        augment_fn=norm_augment, preprocess_fn=normalize01)
    t2 = reports[1]
    assert t2.grew == 1 and state.width_mult == 1.5
    # the goal-missed task compacted within allow_acc_diff of best effort
    assert t2.chosen_ratio > 0.0, (t2.chosen_ratio, t2.ratio_to_acc)
    # ... so the NEXT task actually owns shared entries (no starvation)
    own = np.concatenate([np.asarray(v).ravel()
                          for v in state.ownership.values()])
    assert int((own == 3).sum()) > 0, "t3 starved: owns no shared entries"
