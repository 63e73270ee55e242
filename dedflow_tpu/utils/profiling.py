"""Profiling harness: stage timers + jax.profiler integration.

Replaces the reference's clock()/chrono printf instrumentation
(main.c:123-126, assemble.cu:1555-1556, 1739-1744; its
cuda_profiler_api.h include is never used). `stage_timer` provides the
same per-stage wall-time accounting; `trace` wraps `jax.profiler.trace`
to dump a TensorBoard-compatible trace directory.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class StageTimers:
    """Accumulating per-stage wall timers (device-synced)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {
            k: {"total_s": round(v, 4), "calls": self.counts[k]}
            for k, v in sorted(self.totals.items())
        }


@contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
