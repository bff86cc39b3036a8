"""Larger-than-RAM input path: memmapped datasets must round-trip and feed
the SAME training loop as in-memory arrays (data/stream.py). The reference
has no equivalent — DataLoader workers re-decode JPEGs every epoch
(ref:utils/dataset.py); here decode happens once at conversion time and the
OS pages the flat tensors in on demand."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpg_tpu.data.stream import (DevicePrefetcher, load_memmap_dataset,
                                 save_memmap_dataset)
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import normalize01, synthetic_task, tiny_cnn


@pytest.fixture(scope="module")
def mm_dir(tmp_path_factory):
    data = synthetic_task(0)
    d = tmp_path_factory.mktemp("mmds")
    save_memmap_dataset(str(d), {**data, "num_classes": data["num_classes"]})
    return str(d), data


def test_memmap_roundtrip(mm_dir):
    d, data = mm_dir
    loaded = load_memmap_dataset(d)
    assert isinstance(loaded["train_x"], np.memmap)
    assert loaded["train_x"].dtype == data["train_x"].dtype
    np.testing.assert_array_equal(np.asarray(loaded["train_x"]),
                                  data["train_x"])
    np.testing.assert_array_equal(np.asarray(loaded["test_y"]), data["test_y"])
    assert loaded["num_classes"] == data["num_classes"]


def test_device_prefetcher_preserves_batches():
    xs = [np.full((4, 2), i, np.float32) for i in range(7)]
    ys = [np.full((4,), i, np.int32) for i in range(7)]
    out = list(DevicePrefetcher(zip(xs, ys), depth=3))
    assert len(out) == 7
    for i, (bx, by) in enumerate(out):
        assert isinstance(bx, jax.Array)
        np.testing.assert_array_equal(np.asarray(bx), xs[i])
        np.testing.assert_array_equal(np.asarray(by), ys[i])


def test_manager_trains_from_memmap(mm_dir):
    """The full Manager loop (prefetcher + jitted step) over a memmapped
    dataset learns exactly like the in-memory path."""
    d, data = mm_dir
    loaded = load_memmap_dataset(d)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    mgr = Manager(state, tiny_cnn, 1, loaded,
                  TrainConfig(lr=0.05, compute_dtype=jnp.float32),
                  batch_size=32, lr_schedule="constant",
                  augment_fn=lambda x, r: normalize01(x),
                  preprocess_fn=normalize01)
    res = mgr.train(epochs=6, base_lr=0.05)
    assert res.acc > 0.5, f"memmap path failed to learn: {res.acc}"


def test_native_batcher_reads_through_memmap(mm_dir):
    d, data = mm_dir
    from cpg_tpu.data.native_loader import NativeBatcher, native_available

    if not native_available():
        pytest.skip("native loader unavailable")
    loaded = load_memmap_dataset(d)
    nb = NativeBatcher(loaded["train_x"], np.asarray(loaded["train_y"]),
                       batch_size=16, seed=3)
    assert isinstance(nb.x, np.memmap)  # no silent copy into RAM
    seen = set()
    for bx, by in nb.batches(4):
        assert bx.shape == (16, *data["train_x"].shape[1:])
        # every row must be a real dataset row with its matching label
        for r, lab in zip(bx, by):
            idx = np.flatnonzero(
                (data["train_x"] == r).all(axis=(1, 2, 3)))[0]
            assert data["train_y"][idx] == lab
            seen.add(int(idx))
    nb.close()
    assert len(seen) > 32  # shuffled sampling actually moved through the set


def test_cli_sequence_from_memmap_dir(tmp_path, monkeypatch):
    """--memmap-dir: the CLI runs the whole sequence off memmapped task
    datasets (the larger-than-RAM layout), overriding the experiment data.
    The arch registry is patched to tiny_cnn — this tests the CLI/stream
    plumbing, not VGG16 (whose CPU train time belongs to TPU validation)."""
    import cpg_tpu.models as M
    from cpg_tpu.cli import main as cli_main

    monkeypatch.setitem(M.REGISTRY, "vgg16_bn_cifar", (tiny_cnn, (16, 16, 3)))
    for i in range(2):
        data = synthetic_task(i, hw=16)
        save_memmap_dataset(str(tmp_path / "ds" / f"{i:02d}_task{i}"),
                            {**data, "num_classes": data["num_classes"]})
    rc = cli_main([
        "sequence", "--experiment", "cifar100",
        "--memmap-dir", str(tmp_path / "ds"),
        "--batch-size", "32", "--lr", "0.05", "--dtype", "float32",
        "--lr-schedule", "constant", "--finetune-epochs", "2",
        "--prune-epochs", "1", "--retrain-epochs", "1",
        "--prune-ratios", "0.3", "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert rc == 0
    import os
    finals = sorted(d for d in os.listdir(tmp_path / "ck")
                    if not d.endswith(".pick"))
    assert finals == ["task01_00_task0", "task02_01_task1"]
