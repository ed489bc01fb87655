"""Structured per-iteration metrics with a JSONL sink.

The reference's observability is driver printlns plus an empty logging
plugin stub (src/sd_algorithm/plugin/logging.jl, 0 bytes; SURVEY.md §5.5).
Here every iteration's stats dict (lb/ub estimates, rho, pool sizes, kernel
residuals/iterations) can be appended to a JSONL file and/or summarized.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, IO, Optional

import numpy as np


def _to_scalar(v):
    a = np.asarray(v)
    if a.ndim == 0:
        x = a.item()
        if isinstance(x, (np.bool_, bool)):
            return bool(x)
        if isinstance(x, float) and not np.isfinite(x):
            return None
        return x
    return None  # non-scalars are dropped from the JSONL stream


class MetricsLogger:
    """Append-only JSONL metrics sink with wall-clock stamping."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh: Optional[IO] = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, stats: Dict, **extra) -> Dict:
        rec = {k: _to_scalar(v) for k, v in stats.items()}
        rec = {k: v for k, v in rec.items() if v is not None}
        rec.update(extra)
        rec["wall_s"] = round(time.time() - self._t0, 3)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
