"""ImageFolder ingestion — the reference's native on-disk dataset layout.

Reference (ref:utils/dataset.py train_loader/val_loader): torchvision
ImageFolder trees `root/{train,test}/<class_name>/*.jpg`, decoded by PIL,
Resize(256) + CenterCrop(224) (eval) / random crop + flip (train). Here PIL
decodes and resizes on the host into contiguous uint8 NHWC arrays once —
random crop/flip happen on DEVICE inside the jitted train step
(data/augment.py), so the host does no per-epoch transform work at all.

PIL ships in this image; if it is ever absent the loaders raise a clear
error pointing at the .npz fallback layout (data/finegrained.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".webp")


def _pil():
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is baked into the image
        raise ImportError(
            "PIL unavailable: provide datasets as pre-converted .npz "
            "(CPG_DATA_DIR/<name>/{train,test}.npz with x uint8 NHWC, "
            "y int32) instead of image folders") from e
    return Image


def list_imagefolder(split_dir: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    """[(path, label)], class_names — classes are sorted folder names
    (torchvision ImageFolder's class assignment rule)."""
    classes = sorted(
        d for d in os.listdir(split_dir)
        if os.path.isdir(os.path.join(split_dir, d)))
    samples = []
    for label, cname in enumerate(classes):
        cdir = os.path.join(split_dir, cname)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(IMG_EXTS):
                samples.append((os.path.join(cdir, fn), label))
    return samples, classes


def decode_image(path: str, hw: Tuple[int, int], resize: Optional[int] = None
                 ) -> np.ndarray:
    """One image -> uint8 (H, W, 3). `resize` scales the shorter side first
    (ref val transform Resize(256)); then center-crop/pad to `hw`."""
    Image = _pil()
    img = Image.open(path).convert("RGB")
    h, w = hw
    if resize:
        iw, ih = img.size
        scale = resize / min(iw, ih)
        img = img.resize((max(1, round(iw * scale)),
                          max(1, round(ih * scale))), Image.BILINEAR)
    else:
        img = img.resize((w, h), Image.BILINEAR)
    a = np.asarray(img, np.uint8)
    # center crop (or zero-pad) to exactly (h, w)
    ah, aw = a.shape[:2]
    if ah < h or aw < w:
        pad = np.zeros((max(ah, h), max(aw, w), 3), np.uint8)
        pad[:ah, :aw] = a
        a = pad
        ah, aw = a.shape[:2]
    y0, x0 = (ah - h) // 2, (aw - w) // 2
    return a[y0:y0 + h, x0:x0 + w]


def load_imagefolder(
    split_dir: str,
    hw: Tuple[int, int] = (224, 224),
    resize: Optional[int] = 256,
    limit_per_class: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Whole split -> (x uint8 (N,H,W,3), y int32, class_names)."""
    samples, classes = list_imagefolder(split_dir)
    if limit_per_class:
        kept, counts = [], {}
        for p, l in samples:
            if counts.get(l, 0) < limit_per_class:
                kept.append((p, l))
                counts[l] = counts.get(l, 0) + 1
        samples = kept
    if not samples:
        raise FileNotFoundError(f"no images under {split_dir}")
    x = np.empty((len(samples), hw[0], hw[1], 3), np.uint8)
    y = np.empty(len(samples), np.int32)
    for i, (p, l) in enumerate(samples):
        x[i] = decode_image(p, hw, resize)
        y[i] = l
    return x, y, classes


def imagefolder_splits(root: str, hw=(224, 224), resize: Optional[int] = 256,
                       limit_per_class: Optional[int] = None,
                       splits: Sequence[str] = ("train", "test")) -> Optional[Dict]:
    """root/{train,test|val}/<class>/*.jpg -> task-dict arrays, or None if
    the layout isn't there (callers then fall through to .npz / synthetic)."""
    names = {}
    for want in splits:
        cands = [want] if want != "test" else ["test", "val", "valid"]
        found = next((c for c in cands
                      if os.path.isdir(os.path.join(root, c))), None)
        if found is None:
            return None
        names[want] = os.path.join(root, found)
    tx, ty, classes = load_imagefolder(names["train"], hw, resize,
                                       limit_per_class)
    vx, vy, vclasses = load_imagefolder(names["test"], hw, resize,
                                        limit_per_class)
    if classes != vclasses:
        raise ValueError(
            f"{root}: train/test class folders differ "
            f"({len(classes)} vs {len(vclasses)})")
    return {"train_x": tx, "train_y": ty, "test_x": vx, "test_y": vy,
            "num_classes": len(classes), "class_names": classes}
