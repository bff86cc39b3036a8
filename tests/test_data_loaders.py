"""Real-data parsers: cifar-100-python pickles, fine-grained npz, face npz —
exercised against fabricated on-disk datasets (no network in this env)."""

import os
import pickle

import numpy as np

from cpg_tpu.data.cifar import (CLASSES_PER_TASK, FINE_TO_COARSE, NUM_TASKS,
                                SUPERCLASS_NAMES, load_cifar100, task_splits)
from cpg_tpu.data.face import casia_task
from cpg_tpu.data.finegrained import finegrained_task


def _write_fake_cifar(root):
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d)
    rng = np.random.RandomState(0)

    def blob(n):
        return {
            b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8
                                 ).astype(np.uint8),
            b"fine_labels": rng.randint(0, 100, n).tolist(),
        }

    with open(os.path.join(d, "train"), "wb") as f:
        pickle.dump(blob(400), f)
    with open(os.path.join(d, "test"), "wb") as f:
        pickle.dump(blob(100), f)
    return d


def test_fine_to_coarse_mapping_is_balanced():
    # 20 superclasses x 5 fine classes each — the official CIFAR-100 split
    assert len(SUPERCLASS_NAMES) == NUM_TASKS == 20
    counts = np.bincount(FINE_TO_COARSE, minlength=20)
    assert (counts == CLASSES_PER_TASK).all()


def test_cifar_pickle_parser_and_split(tmp_path):
    d = _write_fake_cifar(str(tmp_path))
    data = load_cifar100(d)
    assert data is not None
    tx, ty, vx, vy = data
    assert tx.shape == (400, 32, 32, 3) and tx.dtype == np.uint8
    tasks = task_splits(data=data)
    assert list(tasks) == SUPERCLASS_NAMES
    total = sum(len(t["train_y"]) for t in tasks.values())
    assert total == 400  # every sample lands in exactly one task
    for t in tasks.values():
        assert t["num_classes"] == 5
        if len(t["train_y"]):
            assert t["train_y"].min() >= 0 and t["train_y"].max() < 5


def test_cifar_env_dir_discovery(tmp_path, monkeypatch):
    _write_fake_cifar(str(tmp_path))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    from cpg_tpu.data.cifar import find_cifar100_dir

    assert find_cifar100_dir() == str(tmp_path / "cifar-100-python")


def test_finegrained_npz_loader(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    d = tmp_path / "flowers"
    d.mkdir()
    np.savez(d / "train.npz", x=rng.randint(0, 256, (12, 64, 64, 3),
                                            dtype=np.uint8),
             y=rng.randint(0, 102, 12))
    np.savez(d / "test.npz", x=rng.randint(0, 256, (4, 64, 64, 3),
                                           dtype=np.uint8),
             y=rng.randint(0, 102, 4))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    t = finegrained_task("flowers")
    assert t["train_x"].shape == (12, 64, 64, 3)
    assert t["num_classes"] == 102  # real class count, not capped


def test_face_npz_loader(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    np.savez(tmp_path / "casia_train.npz",
             x=rng.randint(0, 256, (30, 112, 96, 3), dtype=np.uint8),
             y=rng.randint(0, 6, 30))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    t = casia_task()
    assert t["train_x"].shape[1:] == (112, 96, 3)
    assert t["num_classes"] == 6
    assert t["model_kwargs"] == {"head_type": "angle"}
