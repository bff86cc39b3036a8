"""Utils: metrics, logging, structured JSONL records (ref:utils/__init__.py
`Metric`, `set_logger`, `classification_accuracy` + SURVEY §5 observability
plan)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


class Metric:
    """Running average (ref:utils/__init__.py Metric)."""

    def __init__(self, name: str = "metric"):
        self.name = name
        self.sum = 0.0
        self.n = 0

    def update(self, value, n: int = 1):
        self.sum += float(value) * n
        self.n += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.n, 1)


def set_logger(logfile: Optional[str] = None, level=logging.INFO):
    """Console + optional file logging (ref --logfile)."""
    log = logging.getLogger("cpg_tpu")
    log.setLevel(level)
    log.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname).1s %(message)s",
                            "%H:%M:%S")
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(fmt)
    log.addHandler(h)
    if logfile:
        os.makedirs(os.path.dirname(logfile) or ".", exist_ok=True)
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        log.addHandler(fh)
    return log


class JsonlWriter:
    """Structured per-step/per-phase records (SURVEY §5: ratio->acc records
    and step metrics are public artifacts, not just logs)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, **record):
        record.setdefault("ts", time.time())
        self._f.write(json.dumps(record) + "\n")

    def close(self):
        self._f.close()
