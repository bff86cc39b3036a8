"""Larger-than-RAM input: memory-mapped datasets + device-transfer prefetch.

The reference streams JPEGs through torch DataLoader worker processes
(ref:utils/dataset.py); every epoch re-decodes every image on the host. The
TPU-native pipeline keeps decode OUT of the steady state entirely: datasets
are converted ONCE to flat uint8 .npy tensors (`save_memmap_dataset`, or
`cpg_tpu.data.imagefolder` for the reference's JPEG trees), then training maps
them with `np.load(mmap_mode="r")` — the OS pages data in on demand, so the
working set, not the dataset, must fit in RAM. Batch gather runs on the C++
prefetch thread (native/loader.cc) against the borrowed mapping, and
`DevicePrefetcher` keeps the next batch's host->device transfer in flight
while the current step computes — the dispatch-latency analogue of torch's
`pin_memory` + async copies, without either.

All augmentation stays on device (data/augment.py, fused into the jitted
step), so the host path is: mmap read -> memcpy gather -> DMA. Nothing here
depends on dataset size.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Iterator, Tuple

import jax
import numpy as np

_META = "meta.json"


def save_memmap_dataset(out_dir: str, data: Dict[str, np.ndarray]) -> None:
    """Write a data dict ({train,test}_{x,y} [+ extras]) as flat .npy files.

    .npy is already a memmap-friendly format (header + raw C-order bytes);
    np.save streams, so this works even when `data` values are themselves
    memmaps or larger than RAM.
    """
    os.makedirs(out_dir, exist_ok=True)
    meta = {}
    for k, v in data.items():
        if isinstance(v, np.ndarray):
            np.save(os.path.join(out_dir, f"{k}.npy"), v)
            meta[k] = {"shape": list(v.shape), "dtype": str(v.dtype)}
        elif not callable(v):
            meta[k] = v  # scalars (num_classes, names, ...) go to meta.json
            # callables (a face task's loss_fn) can't serialize: store the
            # marker {"loss": "angle"} instead — the CLI reattaches it
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)


def load_memmap_dataset(in_dir: str) -> Dict:
    """Load a `save_memmap_dataset` directory with every array memory-mapped
    read-only. Drop-in for the in-memory data dicts Manager/run_sequence eat:
    fancy-indexed batch gathers and NativeBatcher both read through the map.
    """
    with open(os.path.join(in_dir, _META)) as f:
        meta = json.load(f)
    out: Dict = {}
    for k, v in meta.items():
        path = os.path.join(in_dir, f"{k}.npy")
        if isinstance(v, dict) and os.path.exists(path):
            out[k] = np.load(path, mmap_mode="r")
        else:
            out[k] = v
    return out


class DevicePrefetcher:
    """Overlap host->device transfer with device compute.

    Wraps a host batch iterator; always keeps `depth` batches' device_put in
    flight (transfers are async in jax — the arrays are futures until used).
    On the relayed backend here each dispatch costs ~0.5-1.4 ms, so hiding the
    transfer behind the previous step matters at small step times.
    """

    def __init__(self, it: Iterable[Tuple[np.ndarray, np.ndarray]],
                 sharding=None, depth: int = 2):
        self._it = iter(it)
        self._sharding = sharding
        self._depth = max(depth, 1)
        self._fifo: list = []

    def _put(self, xy):
        x, y = xy
        if self._sharding is not None:
            if jax.process_count() > 1:
                # multi-process mesh: x/y are THIS process's rows of the
                # global batch; assemble the global sharded array from the
                # per-process shards (a plain device_put would mis-read the
                # local rows as the whole global batch)
                return (jax.make_array_from_process_local_data(
                            self._sharding, np.asarray(x)),
                        jax.make_array_from_process_local_data(
                            self._sharding, np.asarray(y)))
            return (jax.device_put(x, self._sharding),
                    jax.device_put(y, self._sharding))
        return jax.device_put(x), jax.device_put(y)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        try:
            while len(self._fifo) < self._depth:
                self._fifo.append(self._put(next(self._it)))
        except StopIteration:
            pass
        while self._fifo:
            out = self._fifo.pop(0)
            try:
                self._fifo.append(self._put(next(self._it)))
            except StopIteration:
                pass
            yield out
