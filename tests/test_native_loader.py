"""Native C++ prefetch loader: build, correctness, epoch coverage, prefetch."""

import numpy as np
import pytest

from cpg_tpu.data.native_loader import NativeBatcher, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no g++/make toolchain")


def test_batches_are_valid_pairs():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (100, 8, 8, 3), dtype=np.uint8)
    y = np.arange(100, dtype=np.int32)
    b = NativeBatcher(x, y, batch_size=16, seed=1)
    for bx, by in b.batches(10):
        assert bx.shape == (16, 8, 8, 3) and by.shape == (16,)
        for img, lab in zip(bx, by):
            np.testing.assert_array_equal(img, x[lab])  # gather is consistent
    b.close()


def test_epoch_covers_all_samples():
    x = np.zeros((64, 2, 2, 1), np.uint8)
    y = np.arange(64, dtype=np.int32)
    b = NativeBatcher(x, y, batch_size=16, seed=3)
    seen = []
    for _, by in b.batches(4):  # exactly one epoch
        seen.extend(by.tolist())
    assert sorted(seen) == list(range(64))  # shuffled permutation, no repeats
    b.close()


def test_no_shuffle_is_sequential():
    x = np.zeros((32, 2, 2, 1), np.uint8)
    y = np.arange(32, dtype=np.int32)
    b = NativeBatcher(x, y, batch_size=8, seed=0, shuffle=False)
    got = []
    for _, by in b.batches(4):
        got.extend(by.tolist())
    assert got == list(range(32))
    b.close()


def test_deterministic_given_seed():
    x = np.zeros((64, 2, 2, 1), np.uint8)
    y = np.arange(64, dtype=np.int32)
    a = [by.tolist() for _, by in NativeBatcher(x, y, 16, seed=7).batches(8)]
    b = [by.tolist() for _, by in NativeBatcher(x, y, 16, seed=7).batches(8)]
    assert a == b


def test_prefetch_overlap_throughput():
    """Ring must hold batches ready: draining 3 instantly after a pause."""
    import time

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (512, 32, 32, 3), dtype=np.uint8)
    y = np.zeros(512, np.int32)
    b = NativeBatcher(x, y, batch_size=64, seed=0, capacity=3)
    b.next()
    time.sleep(0.1)  # let the worker fill the ring
    t0 = time.perf_counter()
    for _ in range(3):
        b.next()
    dt = time.perf_counter() - t0
    assert dt < 0.05, f"prefetch ring not overlapping: {dt:.3f}s for 3 batches"
    b.close()
