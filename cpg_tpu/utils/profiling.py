"""Profiling / tracing (SURVEY §5: the reference has none beyond tqdm).

jax.profiler trace around phases + a step-time meter whose completion barrier
is a host scalar readback — NOTE: on relayed-TPU environments
block_until_ready can return before remote execution finishes (observed 20x
inflated throughput), so `StepTimer` requires callers to hand it a scalar
from the step output chain.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Perfetto-compatible device trace around a code region:
    `with trace('/tmp/cpg_trace'): run_phase()` -> open in xprof/perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Phase step-time meter with an explicit readback barrier.

    usage:
        t = StepTimer()
        t.start()
        for ...: out = step(...)
        t.stop(barrier=out[-1]['loss'])   # scalar that chains every step
        t.images_per_sec(n_steps * batch)
    """

    def __init__(self):
        self._t0: Optional[float] = None
        self.seconds = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, barrier):
        float(barrier)  # host readback forces completion of the whole chain
        self.seconds = time.perf_counter() - self._t0
        return self.seconds

    def images_per_sec(self, n_images: int) -> float:
        return n_images / max(self.seconds, 1e-9)
