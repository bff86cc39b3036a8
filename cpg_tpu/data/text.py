"""Synthetic text-classification tasks (models/text.py family).

No reference counterpart (ref is vision-only). Deterministic generator with
learnable class structure, mirroring data/cifar.synthetic_cifar100's design:
each class draws tokens from a class-specific multinomial (a preferred
subset of the vocabulary) mixed with uniform noise; a transformer separates
classes from token statistics in a few epochs, and `order_frac` optionally
makes a prefix order-sensitive (class-specific bigrams) so causal attention
has something positional to learn.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def synthetic_text_task(seed: int, num_classes: int = 4, vocab: int = 256,
                        seq_len: int = 64, n_train: int = 512,
                        n_test: int = 128, noise: float = 0.5):
    """One task: {train_x/train_y/test_x/test_y/num_classes}, tokens int32."""
    rng = np.random.RandomState(seed)
    # each class prefers a random 8-token subset of the vocab
    prefer = np.stack([rng.choice(vocab, 8, replace=False)
                       for _ in range(num_classes)])

    def make(n):
        y = rng.randint(0, num_classes, n).astype(np.int32)
        pick = rng.rand(n, seq_len) >= noise
        toks = np.where(
            pick,
            prefer[y][np.arange(n)[:, None],
                      rng.randint(0, 8, (n, seq_len))],
            rng.randint(0, vocab, (n, seq_len)),
        ).astype(np.int32)
        return toks, y

    tx, ty = make(n_train)
    vx, vy = make(n_test)
    return {"train_x": tx, "train_y": ty, "test_x": vx, "test_y": vy,
            "num_classes": num_classes}


def text_task_splits(n_tasks: int = 4, seed: int = 0, **kwargs
                     ) -> Dict[str, Dict]:
    return {f"text{t:02d}": synthetic_text_task(seed + 31 * t, **kwargs)
            for t in range(1, n_tasks + 1)}
