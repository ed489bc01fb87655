"""Profiling hooks: jax.profiler traces + simple phase timers.

The reference's readme lists "Profiling needed" as an open TODO
(readme.md:15-16); it has no tracing at all (SURVEY.md §5.1)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace around a block (no-op when log_dir is None).

    View with TensorBoard or xprof on the written trace directory."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Accumulating wall-clock timers for host-visible phases (sample /
    subproblem LP / cut build / master — blocking on device results)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * self.totals[k]
                                     / max(self.counts[k], 1), 3)}
                for k in self.totals}
