"""CLI surface + baselines: individual goals file, PackNet mode, inference."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.train.baselines import (run_packnet_sequence,
                                     train_individual_baselines)
from cpg_tpu.train.sequence import SequenceConfig
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn  # noqa: F401


def test_individual_baselines_writes_goals(tmp_path):
    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    acc_file = str(tmp_path / "baseline_acc.json")
    goals = train_individual_baselines(
        "tiny_cnn", tasks, cfg, epochs=6, batch_size=32, lr=0.05,
        augment_fn=norm_augment, preprocess_fn=normalize01, acc_file=acc_file)
    assert set(goals) == {"t1", "t2"}
    assert all(v > 0.5 for v in goals.values()), goals
    assert json.load(open(acc_file)) == goals


def test_packnet_mode_freezes_piggymask():
    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=5, prune_epochs=2, retrain_epochs=1,
                         prune_ratios=(0.4,), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0)
    state, reports = run_packnet_sequence(
        "tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
        preprocess_fn=normalize01)
    assert reports[1].final_acc > 0.55
    # piggymask untouched: still exactly at its 1e-2 init (all prior picked)
    pm = state.tasks[2].piggymask
    for leaf in jax.tree.leaves(pm):
        np.testing.assert_array_equal(np.array(leaf),
                                      np.full(leaf.shape, 1e-2, np.float32))


def test_cli_end_to_end(tmp_path):
    """Drive the module CLI as a subprocess: tiny 2-task cifar100 run."""
    cmd = [
        sys.executable, "-m", "cpg_tpu", "sequence",
        "--experiment", "cifar100", "--num-tasks", "2",
        "--batch-size", "32", "--lr", "0.05", "--dtype", "float32",
        "--finetune-epochs", "2", "--prune-epochs", "1",
        "--retrain-epochs", "1", "--prune-ratios", "0.3",
        "--synthetic-train-per-class", "40",
        "--synthetic-test-per-class", "10",
        "--record-dir", str(tmp_path),
        "--checkpoint-dir", str(tmp_path / "ckpts"),
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(summary["tasks"]) == 2
    assert (tmp_path / "ratio_acc_aquatic_mammals.json").exists()
    ckpt = tmp_path / "ckpts" / "task02_fish"
    assert (tmp_path / "ckpts" / "task01_aquatic_mammals" /
            "cpg_meta.json").exists()
    assert (ckpt / "cpg_meta.json").exists()

    # chain the inference subcommand over the produced checkpoint (in-process)
    import contextlib
    import io

    from cpg_tpu.cli import main as cli_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "inference", "--checkpoint", str(ckpt), "--task-id", "1",
            "--experiment", "cifar100", "--num-tasks", "2",
            "--batch-size", "25",
            "--synthetic-train-per-class", "40",
            "--synthetic-test-per-class", "10",
        ])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip())
    assert rec["task"] == "aquatic_mammals" and 0.0 <= rec["top1"] <= 1.0
