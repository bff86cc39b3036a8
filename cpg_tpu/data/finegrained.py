"""Fine-grained classification datasets (ResNet-50 sequence).

Reference (ref:utils/dataset.py `train_loader`/`val_loader`,
ref:CPG_imagenet_main.py): ImageFolder datasets — CUBS (200 classes),
Stanford Cars (196), Flowers (102), WikiArt (195), Sketch (250) — with
Resize/RandomCrop(224) + HFlip + ImageNet normalization, added sequentially
on top of an ImageNet-pretrained task 1.

Environment has no datasets/network: loaders read `CPG_DATA_DIR/<name>/
{train,test}.npz` (x uint8 NHWC, y int32) when present; otherwise a synthetic
stand-in with the right class counts (scaled down via `max_classes` for
tests/benches).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# dataset -> num classes (the reference's five fine-grained additions)
FINEGRAINED_SPECS = {
    "cubs_cropped": 200,
    "stanford_cars_cropped": 196,
    "flowers": 102,
    "wikiart": 195,
    "sketches": 250,
}
IMAGE_HW = (224, 224)


def _load_npz(d: str, name: str):
    p = os.path.join(d, name)
    tr, te = os.path.join(p, "train.npz"), os.path.join(p, "test.npz")
    if os.path.exists(tr) and os.path.exists(te):
        a, b = np.load(tr), np.load(te)
        return (a["x"], a["y"].astype(np.int32),
                b["x"], b["y"].astype(np.int32))
    return None


def synthetic_imagefolder(num_classes, n_train_per=8, n_test_per=2,
                          hw=IMAGE_HW, seed=0):
    rng = np.random.RandomState(seed)
    h, w = hw
    protos = rng.randn(num_classes, h // 16, w // 16, 3).astype(np.float32) * 3
    protos = np.repeat(np.repeat(protos, 16, axis=1), 16, axis=2)

    def make(n_per):
        xs, ys = [], []
        for c in range(num_classes):
            img = protos[c] + rng.randn(n_per, h, w, 3).astype(np.float32)
            xs.append(np.clip((img + 12.0) / 24.0 * 255, 0, 255).astype(np.uint8))
            ys.append(np.full(n_per, c, np.int32))
        x, y = np.concatenate(xs), np.concatenate(ys)
        p = rng.permutation(len(x))
        return x[p], y[p]

    tx, ty = make(n_train_per)
    vx, vy = make(n_test_per)
    return tx, ty, vx, vy


def finegrained_task(name: str, data_dir: Optional[str] = None,
                     max_classes: Optional[int] = None, seed: int = 0,
                     hw=IMAGE_HW) -> Dict:
    if name not in FINEGRAINED_SPECS:
        raise KeyError(f"unknown fine-grained dataset {name!r}")
    nc = FINEGRAINED_SPECS[name]
    d = data_dir or os.environ.get("CPG_DATA_DIR")
    data = None
    if d and os.path.isdir(os.path.join(d, name)):
        # the reference's native layout: ImageFolder JPEG trees
        # (ref:utils/dataset.py) under CPG_DATA_DIR/<name>/{train,test}/
        from .imagefolder import imagefolder_splits

        fold = imagefolder_splits(os.path.join(d, name), hw=hw)
        if fold is not None:
            fold["num_classes"] = max(fold["num_classes"], 1)
            return {k: fold[k] for k in
                    ("train_x", "train_y", "test_x", "test_y", "num_classes")}
    data = _load_npz(d, name) if d else None
    if data is None:
        nc = min(nc, max_classes) if max_classes else nc
        data = synthetic_imagefolder(nc, hw=hw, seed=seed)
    tx, ty, vx, vy = data
    return {"train_x": tx, "train_y": ty, "test_x": vx, "test_y": vy,
            "num_classes": nc}
