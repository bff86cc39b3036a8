"""Text-classification transformer (models/text.py): CPG on a second
modality — the embedding TABLE is a sharable masked kernel (framework.sembed)
held to the same invariants as conv/dense kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.ownership import free_ratio
from cpg_tpu.data.text import synthetic_text_task
from cpg_tpu.inference import predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import grow_state, init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import ident_augment, tiny_textcls


def _task(seed, num_classes=4):
    return synthetic_text_task(seed, num_classes=num_classes, vocab=64,
                               seq_len=16, n_train=384, n_test=96)


def _cfg():
    return TrainConfig(lr=3e-3, lr_mask=1e-3, compute_dtype=jnp.float32,
                       optimizer="adam")


def _manager(state, task_id, data, seed=0):
    return Manager(state, tiny_textcls, task_id, data, _cfg(), batch_size=32,
                   seed=seed, lr_schedule="constant",
                   augment_fn=ident_augment, preprocess_fn=None)


def test_text_train_prune_add_task_never_forget():
    d1, d2 = _task(0), _task(7, num_classes=3)
    state = init_state("tiny_textcls", jax.random.PRNGKey(0))
    start_task(state, "a", d1["num_classes"], jax.random.PRNGKey(1))
    mgr1 = _manager(state, 1, d1)
    res = mgr1.train(epochs=8)
    assert res.acc > 0.7, f"text task-1 failed to learn: acc={res.acc}"
    mgr1.train(epochs=4, prune_to=0.5, prune_freq=5, base_lr=1e-3)
    assert abs(float(free_ratio(state.ownership)) - 0.5) < 0.02
    # the embedding table pruned like any kernel: released entries are zero
    own = state.ownership["embed/kernel"]
    w = state.shared["embed/kernel"]
    assert float(jnp.abs(jnp.where(own == 0, w, 0)).max()) == 0.0
    assert int((own == 0).sum()) > 0

    x = jnp.asarray(d1["test_x"][:16])
    before = predict(state, 1, x)

    start_task(state, "b", d2["num_classes"], jax.random.PRNGKey(2))
    res2 = _manager(state, 2, d2).train(epochs=8)
    assert res2.acc > 0.6, f"text task-2 failed to learn: acc={res2.acc}"
    np.testing.assert_array_equal(np.array(before),
                                  np.array(predict(state, 1, x)))


def test_text_grow_preserves_old_task():
    """Transformer growth law on the text family: the embedding table keeps
    its shape (vocab AND embed dim fixed) while heads/MLP widen; old-task
    logits are preserved exactly."""
    d = _task(0)
    state = init_state("tiny_textcls", jax.random.PRNGKey(0))
    start_task(state, "a", d["num_classes"], jax.random.PRNGKey(1))
    mgr = _manager(state, 1, d)
    mgr.train(epochs=5)
    mgr.train(epochs=3, prune_to=0.4, prune_freq=5, base_lr=1e-3)
    x = jnp.asarray(d["test_x"][:8])
    before = predict(state, 1, x)

    grow_state(state, 1.5, jax.random.PRNGKey(9))
    assert state.shared["embed/kernel"].shape == (64, 32)  # untouched
    assert state.shared["blocks/0/attn/q/kernel"].shape == (32, 48)
    assert state.shared["blocks/0/mlp/fc1/kernel"].shape == (32, 192)
    # across the growth the math is exact but the XLA program changes shape
    # (wider K dots reassociate) — tight allclose, same convention as the
    # SphereNet growth test / SequenceConfig.verify_growth
    after = np.array(predict(state, 1, x))
    np.testing.assert_allclose(np.array(before), after, rtol=2e-6, atol=2e-6)
    # grown capacity trains a new task without disturbing task 1: same
    # program shapes from here on, so BIT-equal
    d2 = _task(5, num_classes=3)
    start_task(state, "b", 3, jax.random.PRNGKey(2))
    res = _manager(state, 2, d2, seed=1).train(epochs=8)
    assert res.acc > 0.6, res
    np.testing.assert_array_equal(after, np.array(predict(state, 1, x)))


def test_text_serving_matches_predict():
    """TaskServer on token inputs equals predict(); also pins the
    integer-input compute-dtype default (an int32 x must not drag the model
    into int arithmetic — inference._float_dtype_of)."""
    from cpg_tpu.serve import TaskServer

    d = _task(0)
    state = init_state("tiny_textcls", jax.random.PRNGKey(0))
    start_task(state, "a", d["num_classes"], jax.random.PRNGKey(1))
    _manager(state, 1, d).train(epochs=2)
    x = d["test_x"][:5]
    srv = TaskServer(state, compute_dtype=jnp.float32, min_bucket=4)
    got = srv.predict(1, x)
    want = np.array(predict(state, 1, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # distinct token rows give distinct logits (the int32-forward regression
    # collapsed every row to the same vector)
    assert np.abs(want[0] - want[1]).max() > 1e-4
    # int8 PTQ: sembed must DEQUANTIZE the gathered table rows (a raw int8
    # gather scales embeddings by ~127/|w| and garbles every logit); the
    # serving contract is top-1 agreement with bf16
    srv8 = TaskServer(state, quantize="int8", compute_dtype=jnp.float32,
                      min_bucket=4)
    got8 = srv8.predict(1, d["test_x"][:32])
    ref = np.array(predict(state, 1, jnp.asarray(d["test_x"][:32])))
    agree = (np.argmax(got8, -1) == np.argmax(ref, -1)).mean()
    assert agree >= 0.9, f"int8 text top-1 agreement {agree}"


def test_text_cli_end_to_end(tmp_path):
    """CLI reachability of the text family: sequence -> checkpoint ->
    inference subcommand (tokens, no preprocess)."""
    import contextlib
    import io
    import json as _json
    import os
    import subprocess
    import sys

    cmd = [
        sys.executable, "-m", "cpg_tpu", "sequence",
        "--experiment", "textcls", "--num-tasks", "2",
        "--batch-size", "64", "--lr", "0.003", "--optimizer", "adam",
        "--dtype", "float32", "--finetune-epochs", "2",
        "--prune-epochs", "1", "--retrain-epochs", "1",
        "--prune-ratios", "0.3",
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
    summary = _json.loads(out.stdout.strip().splitlines()[-1])
    assert len(summary["tasks"]) == 2

    from cpg_tpu.cli import main as cli_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["inference", "--experiment", "textcls",
                       "--checkpoint", str(tmp_path / "ckpts" / "task02_text02"),
                       "--task-id", "1"])
    assert rc in (0, None)
    res = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["n"] > 0 and res["top1"] > 0.5, res


def test_text_order_frac_plants_oriented_pairs():
    """order_frac: class-ORIENTED pairs from the reserved vocab band — the
    token marginals carry no class signal (both pair tokens appear equally
    often for every class); only the within-pair ORDER does. And
    order_frac=0.0 must be bit-identical to the pre-order_frac generator
    (no extra rng draws)."""
    from cpg_tpu.data.text import synthetic_text_task

    base = synthetic_text_task(7, num_classes=2, vocab=256, seq_len=32)
    again = synthetic_text_task(7, num_classes=2, vocab=256, seq_len=32,
                                order_frac=0.0)
    np.testing.assert_array_equal(base["train_x"], again["train_x"])

    d = synthetic_text_task(7, num_classes=2, vocab=256, seq_len=32,
                            order_frac=0.5, noise=1.0)
    a, b = 254, 255  # pair 0 of the reserved band (1 bit for 2 classes)
    toks, y = d["train_x"], d["train_y"]
    fwd = np.zeros(2, np.int64)   # (a, b) adjacencies at even slots
    rev = np.zeros(2, np.int64)   # (b, a)
    for c in (0, 1):
        rows = toks[y == c]
        fwd[c] = np.sum((rows[:, 0::2] == a) & (rows[:, 1::2] == b))
        rev[c] = np.sum((rows[:, 0::2] == b) & (rows[:, 1::2] == a))
    # class 0 (bit 0) plants (a, b); class 1 plants (b, a); uniform noise
    # can fake a handful of adjacencies but not the planted volume
    assert fwd[0] > 10 * max(rev[0], 1), (fwd, rev)
    assert rev[1] > 10 * max(fwd[1], 1), (fwd, rev)
    # marginals: each class emits both tokens of the pair equally often
    for c in (0, 1):
        rows = toks[y == c]
        na, nb = np.sum(rows == a), np.sum(rows == b)
        assert abs(na - nb) <= 0.1 * (na + nb), (na, nb)


def test_text_state_level_model_kwargs_and_shape():
    """Arch-level SHAPE options (vocab, seq_len) ride CPGState.model_kwargs /
    .in_shape: init_state sizes the shared embedding, start_task/grow_state
    agree, checkpoints round-trip them, and TaskServer serves the custom
    shape. Any real vocabulary is > 256, so this path is what production
    text use actually needs."""
    import tempfile

    from cpg_tpu.serve import TaskServer
    from cpg_tpu.utils.checkpoint import (load_state, save_state,
                                          wait_for_saves)

    d = synthetic_text_task(3, num_classes=4, vocab=300, seq_len=16,
                            n_train=128, n_test=32)
    state = init_state("textcls", jax.random.PRNGKey(0), batch_hw=(16,),
                       model_kwargs={"vocab": 300})
    start_task(state, "t1", 4, jax.random.PRNGKey(1),
               model_kwargs={"causal": True})
    # state-level + task-level merge, task wins on collisions
    assert state.forward_kwargs(1) == {"vocab": 300, "causal": True}
    from cpg_tpu.models import get_model

    Manager(state, get_model("textcls")[0], 1, d, _cfg(), batch_size=32,
            lr_schedule="constant", augment_fn=ident_augment,
            preprocess_fn=None).train(epochs=1)
    logits = np.asarray(predict(state, 1, d["test_x"][:8]))

    with tempfile.TemporaryDirectory() as td:
        save_state(state, td + "/ck")
        wait_for_saves()
        st2 = load_state(td + "/ck")
        assert st2.model_kwargs == {"vocab": 300}
        assert st2.in_shape == (16,)
        np.testing.assert_array_equal(
            np.asarray(predict(st2, 1, d["test_x"][:8])), logits)

    # growth must init fresh trees at the SAME custom shapes
    state = grow_state(state, 1.5, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(predict(state, 1,
                                                  d["test_x"][:8])),
                               logits, rtol=2e-6, atol=2e-6)

    srv = TaskServer(state, compute_dtype=jnp.float32, min_bucket=8)
    assert srv.in_shape == (16,)
    x = d["test_x"][:4]
    want = srv.predict(1, x)
    with tempfile.TemporaryDirectory() as td:
        srv.export(td + "/art")
        srv2 = TaskServer.load(td + "/art", min_bucket=8)
        assert srv2.in_shape == (16,)
        np.testing.assert_allclose(srv2.predict(1, x), want,
                                   rtol=1e-3, atol=1e-3)
