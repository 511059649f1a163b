"""Timers + profiling helpers (observability).

Replaces utils::Timer (utils/include/timer.h:14-36) and the MPCVerbosityLevel
timing printouts (mpc/include/mpc.h:32-37).  For device work the right tool
is jax.profiler traces; these host timers bracket dispatch+blocking regions
the same way the reference brackets solver stages.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Timer:
    """Named steady-clock timer (utils::Timer semantics)."""

    def __init__(self, name: str):
        self.name = name
        self._t0 = None
        self.elapsed_ms = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        return self.elapsed_ms

    def print_elapsed(self):
        print(f"[timer] {self.name}: {self.elapsed_ms:.3f} ms")


class StageTimers:
    """Accumulating per-stage timers with a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += (time.perf_counter() - t0) * 1e3
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'stage':<28s} {'total ms':>10s} {'calls':>7s} {'avg ms':>9s}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<28s} {t:>10.2f} {c:>7d} {t / c:>9.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (TPU timeline; the device-side analog of
    the reference's per-stage timers)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
