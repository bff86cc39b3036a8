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


def test_packnet_mode_no_masks_and_matches_frozen_mask_math():
    """PackNet mode must (a) materialize NO piggymask tensors (VERDICT r2
    weak #7: 20 tasks x mult 2.0 of frozen masks + dead Adam state OOMs a
    16GB chip) and (b) reproduce the old frozen-all-ones-mask numerics — the
    forward math is identical, only the dead tensors are gone."""
    import dataclasses

    from cpg_tpu.train.sequence import run_sequence

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=5, prune_epochs=2, retrain_epochs=1,
                         prune_ratios=(0.4,), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0)
    state, reports = run_packnet_sequence(
        "tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
        preprocess_fn=normalize01)
    assert reports[1].final_acc > 0.55
    assert state.mask_mode == "packnet"
    # NO per-task mask tensors exist
    assert all(t.piggymask is None for t in state.tasks.values())

    # legacy shape of the same baseline: masks created but frozen at their
    # above-threshold init (binarize -> all ones) — numerics must agree
    legacy_cfg = dataclasses.replace(cfg, train_piggymask=False)
    lstate, lreports = run_sequence(
        "tiny_cnn", tasks, legacy_cfg, seq, augment_fn=norm_augment,
        preprocess_fn=normalize01)
    assert lstate.tasks[2].piggymask is not None  # legacy carries the waste
    for r, lr_ in zip(reports, lreports):
        np.testing.assert_allclose(r.final_acc, lr_.final_acc, atol=1e-6)
    for k in state.shared:
        np.testing.assert_allclose(np.asarray(state.shared[k]),
                                   np.asarray(lstate.shared[k]),
                                   rtol=1e-5, atol=1e-7)


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
    # strip the axon TPU plugin's site dir: its sitecustomize re-pins
    # jax_platforms to "axon,cpu" at interpreter start (overriding the env
    # var), so the subprocess would otherwise initialize the RELAY-backed
    # TPU — contending with real TPU jobs and hanging for the full timeout
    # whenever the relay is unresponsive. This test is a CPU test.
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
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
            "--batch-size", "33",  # does NOT divide the 50-sample split:
            # the padded tail must still be evaluated (VERDICT r2 weak #2)
            "--synthetic-train-per-class", "40",
            "--synthetic-test-per-class", "10",
        ])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip())
    assert rec["task"] == "aquatic_mammals" and 0.0 <= rec["top1"] <= 1.0
    assert rec["n"] == 50  # full split counted, tail included


def test_cli_check_invariants(tmp_path, capsys):
    """`check` must pass a clean state and flag a corrupted one (exit 1)."""
    from cpg_tpu.cli import main as cli_main
    from cpg_tpu.train.sequence import init_state, start_task
    from cpg_tpu.utils.checkpoint import save_state

    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    # zero the free weights like the train step would (virgin init holds
    # kaiming values on FREE entries; I2 activates once a task exists)
    state.shared = jax.tree.map(
        lambda w, m: jnp.where(m == 0, 0.0, w), state.shared, state.ownership)
    clean = str(tmp_path / "clean")
    save_state(state, clean)
    assert cli_main(["check", "--checkpoint", clean]) == 0
    json.loads(capsys.readouterr().out)  # well-formed report
    # corrupt: release one entry's ownership while its weight is nonzero
    # -> I2 violation (a released weight MUST be zero)
    k = next(iter(state.shared))
    w = np.asarray(state.shared[k]).copy()
    m = np.asarray(state.ownership[k]).copy()
    idx = (0,) * w.ndim
    w[idx], m[idx] = 7.0, 0
    state.shared[k] = jnp.asarray(w)
    state.ownership[k] = jnp.asarray(m)
    dirty = str(tmp_path / "dirty")
    save_state(state, dirty)
    assert cli_main(["check", "--checkpoint", dirty]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["clean"] and any("I2" in v for v in rep["violations"])


def test_cli_sequence_init_from(tmp_path, capsys):
    """--init-from continues a sequence from an existing checkpoint (e.g.
    one written by import-torch): tasks already present are skipped, new
    ones train on top, and the inherited task's predictions stay bit-exact
    (zero forgetting through the CLI path)."""
    from cpg_tpu.cli import main as cli_main
    from cpg_tpu.inference import predict
    from cpg_tpu.utils.checkpoint import load_state

    common = [
        "--experiment", "cifar100",
        "--batch-size", "25", "--lr", "0.05", "--dtype", "float32",
        "--finetune-epochs", "1", "--prune-epochs", "1",
        "--retrain-epochs", "1", "--prune-ratios", "0.3",
        "--synthetic-train-per-class", "20",
        "--synthetic-test-per-class", "5",
    ]
    assert cli_main(["sequence", "--num-tasks", "1",
                     "--checkpoint-dir", str(tmp_path / "ck1"), *common]) == 0
    capsys.readouterr()
    base = load_state(str(tmp_path / "ck1" / "task01_aquatic_mammals"))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    before = np.asarray(predict(base, 1, x, compute_dtype=jnp.float32))

    assert cli_main(["sequence", "--num-tasks", "2",
                     "--init-from",
                     str(tmp_path / "ck1" / "task01_aquatic_mammals"),
                     "--checkpoint-dir", str(tmp_path / "ck2"), *common]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [t["name"] for t in summary["tasks"]] == ["fish"]  # task 1 skipped
    cont = load_state(str(tmp_path / "ck2" / "task02_fish"))
    assert cont.num_tasks == 2 and cont.tasks[1].name == "aquatic_mammals"
    after = np.asarray(predict(cont, 1, x, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(after, before)


def test_cli_doctor(tmp_path):
    """`cpg_tpu doctor --json` reports a healthy CPU environment (rc 0) and
    the report carries every check section. Subprocess so the backend probe
    runs exactly as in production (timeout-bound device enumeration)."""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)  # CPU test: never touch the relay
    out = subprocess.run(
        [sys.executable, "-m", "cpg_tpu", "doctor", "--json",
         "--timeout", "120"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["verdict"] == "OK"
    assert rep["backend"]["ok"] and rep["backend"]["backend"] == "cpu"
    assert rep["imports"]["jax"] and rep["compile_cache"]["configured"]
    assert "data_dir" in rep and "host" in rep


def test_pae_expands_where_packnet_cannot():
    """PAE (pack-and-expand, paper Exp-1's third comparison row) = packnet
    mask mode + the growth ladder: an unreachable goal forces a width bump
    (packnet at fixed capacity just accepts the miss), still with zero
    piggymask tensors. Guard: PAE with no expansion headroom is an error."""
    import dataclasses

    import pytest

    from cpg_tpu.train.baselines import run_pae_sequence

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=4, prune_epochs=2, retrain_epochs=1,
                         prune_ratios=(0.4,), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0, on_goal_miss="accept",
                         growth_step=0.5, max_width_mult=1.5)
    goals = {"t1": 0.0, "t2": 1.1}  # t2 unreachable -> must walk the ladder
    state, reports = run_pae_sequence(
        "tiny_cnn", tasks, cfg, seq, goals=goals, augment_fn=norm_augment,
        preprocess_fn=normalize01)
    assert state.mask_mode == "packnet"
    assert all(t.piggymask is None for t in state.tasks.values())
    assert state.width_mult == 1.5 and reports[1].grew

    # the strict PackNet row at fixed capacity: same goal, no growth
    pk_state, pk_reports = run_packnet_sequence(
        "tiny_cnn", tasks, cfg, dataclasses.replace(seq, max_width_mult=1.0),
        goals=goals, augment_fn=norm_augment, preprocess_fn=normalize01)
    assert pk_state.width_mult == 1.0 and not pk_reports[1].grew

    with pytest.raises(ValueError, match="pack-AND-expand"):
        run_pae_sequence("tiny_cnn", tasks, cfg,
                         dataclasses.replace(seq, max_width_mult=1.0))


def test_cli_pretrained_npz_vit(tmp_path):
    """--pretrained-npz dispatches the converter by --arch (previously
    hardwired to ResNet-50): a torch-key ViT npz is adopted as task 1 and
    the sequence continues from it."""
    import os

    import torch

    from .test_torch_parity import TorchViT

    tm = TorchViT(depth=6, dim=256, heads=4, patch=4)  # registry defaults
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    npz = tmp_path / "vit_pre.npz"
    np.savez(npz, **sd)

    cmd = [
        sys.executable, "-m", "cpg_tpu", "sequence",
        "--experiment", "cifar100", "--arch", "vit_cifar", "--num-tasks", "1",
        "--batch-size", "32", "--lr", "0.01", "--dtype", "float32",
        "--finetune-epochs", "1", "--prune-epochs", "1",
        "--retrain-epochs", "1", "--prune-ratios", "0.5",
        "--synthetic-train-per-class", "20",
        "--synthetic-test-per-class", "5",
        "--pretrained-npz", str(npz),
        "--checkpoint-dir", str(tmp_path / "ckpts"),
    ]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)  # CPU test: never touch the relay
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    # task 1 is the adopted pretrained net, so the synthetic task is task 2
    assert len(summary["tasks"]) == 1

    # the adopted task 1 must BE the pretrained net, not just its shared
    # kernels: the private tree (pos_embed with the patch bias folded in,
    # LN affines) must have been installed too
    import glob

    from cpg_tpu.utils.checkpoint import load_state

    ck = sorted(glob.glob(str(tmp_path / "ckpts" / "task*")))[-1]
    st = load_state(ck)
    want_pos = sd["pos"] + sd["patch.bias"]
    np.testing.assert_allclose(
        np.asarray(st.tasks[1].private["patch/pos_embed"]), want_pos,
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.tasks[1].private["blocks/0/ln1/scale"]),
        sd["blocks.0.ln1.weight"], rtol=1e-6, atol=1e-6)
    # the torch q bias was adopted; conv kernels landed in shared
    np.testing.assert_allclose(
        np.asarray(st.tasks[1].private["blocks/0/attn/q/bias"]),
        sd["blocks.0.q.bias"], rtol=1e-6, atol=1e-6)
