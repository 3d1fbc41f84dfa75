"""Profiling helpers: jax.profiler trace capture + a microbenchmark harness
for the BASELINE latency metrics (SURVEY.md §5.1 — the reference has none)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> dict:
    """Median/percentile wall-clock latency of a jitted function."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    return {
        "p50_ms": float(np.median(lat) * 1e3),
        "p90_ms": float(np.percentile(lat, 90) * 1e3),
        "mean_ms": float(lat.mean() * 1e3),
        "iters": iters,
    }


def throughput_fn(fn: Callable, *args, items_per_call: int, iters: int = 10) -> dict:
    """Steady-state items/sec with chained dispatch (single final sync)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"items_per_sec": items_per_call / dt, "step_ms": dt * 1e3}
