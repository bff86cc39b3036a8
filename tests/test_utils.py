"""Utils: Metric, JSONL records, Manager with the native loader."""

import json

import jax
import jax.numpy as jnp

from cpg_tpu.data.native_loader import native_available
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig
from cpg_tpu.utils import JsonlWriter, Metric

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def test_metric():
    m = Metric("acc")
    m.update(1.0, n=3)
    m.update(0.0, n=1)
    assert m.avg == 0.75


def test_jsonl_writer(tmp_path):
    p = str(tmp_path / "log" / "steps.jsonl")
    w = JsonlWriter(p)
    w.write(phase="pick", step=1, loss=0.5)
    w.write(phase="prune", ratio=0.4, acc=0.9)
    w.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["phase"] == "pick" and "ts" in lines[0]
    assert lines[1]["ratio"] == 0.4


def test_manager_with_native_loader():
    if not native_available():
        import pytest

        pytest.skip("no native toolchain")
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    mgr = Manager(
        state, tiny_cnn, 1, data, TrainConfig(lr=0.05, compute_dtype=jnp.float32),
        batch_size=32, lr_schedule="constant", augment_fn=norm_augment,
        preprocess_fn=normalize01, native_loader=True,
    )
    assert mgr._batcher is not None
    res = mgr.train(epochs=8)
    assert res.acc > 0.8, f"native-loader training failed: {res.acc}"


def test_step_lr_schedule():
    from cpg_tpu.train.manager import _lr_at

    assert _lr_at(0.1, 0, 100, "step") == 0.1
    assert _lr_at(0.1, 49, 100, "step") == 0.1
    assert abs(_lr_at(0.1, 50, 100, "step") - 0.01) < 1e-12
    assert abs(_lr_at(0.1, 74, 100, "step") - 0.01) < 1e-12
    assert abs(_lr_at(0.1, 75, 100, "step") - 0.001) < 1e-12


def test_label_smoothing_loss():
    import jax.numpy as jnp
    import numpy as np

    from cpg_tpu.train.losses import cross_entropy, make_cross_entropy

    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.0, 3.0, -2.0]])
    labels = jnp.asarray([0, 1])
    assert make_cross_entropy(0.0) is cross_entropy
    ls = make_cross_entropy(0.1)
    got = float(ls(logits, labels))
    logp = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
    q = np.full((2, 3), 0.1 / 3)
    q[0, 0] += 0.9
    q[1, 1] += 0.9
    want = -(q * logp).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cli_preset_overlay():
    import argparse

    from cpg_tpu.cli import (EXPERIMENT_PRESETS, _FLAG_DEFAULTS,
                             _apply_preset, build_parser)

    build_parser()  # populates _FLAG_DEFAULTS

    # simulate parsed args at defaults except an explicit --lr
    ns = argparse.Namespace(experiment="cifar100", **{
        k: _FLAG_DEFAULTS[k] for k in EXPERIMENT_PRESETS["cifar100"]})
    ns.lr = 0.5  # user override must survive
    _apply_preset(ns)
    assert ns.lr == 0.5
    assert ns.finetune_epochs == 100
    assert ns.lr_schedule == "step"
