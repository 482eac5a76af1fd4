"""Profiling and timing utilities.

Replaces the reference's Boost cpu_timer scaffolding (cvo_main.cpp:32,
49-54, 68-70) with `jax.block_until_ready`-correct phase timers and a
`jax.profiler` trace context (SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock timer keyed by phase name.

    Use `timer.phase("frontend")` as a context manager; pass jax arrays
    to `sync=` to block on device completion before stopping the clock.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def sync_point(self, name, value):
        """Block on `value` and charge the wait to `name`."""
        t0 = time.perf_counter()
        jax.block_until_ready(value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return value

    def report(self):
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(
                    1e3 * self.totals[name] / max(self.counts[name], 1), 3
                ),
            }
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def profiler_trace(logdir):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
