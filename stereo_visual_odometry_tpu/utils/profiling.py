"""Profiling + timing harness.

The reference's only instrumentation is a per-frame wall-clock log
(``/root/reference/src/System.cpp:52-57``). Here: the same per-stage timing
as a reusable context manager (device-synchronizing), plus ``jax.profiler``
trace capture for XLA/TPU op-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


class StageTimer:
    """Accumulates wall-clock per named stage; forces device sync."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {k: {"total_s": self.totals[k], "calls": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        rows = sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"])
        return "\n".join(f"{k:24s} {v['mean_ms']:8.2f} ms x{v['calls']}"
                         for k, v in rows)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean wall-clock seconds per call of a jitted function (synced)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
