"""Tracing / profiling harness (SURVEY §5: the reference has none; the
rebuild provides the JAX profiler + a block_until_ready timing loop).

Usage::

    with trace("/tmp/jax-trace"):           # open in TensorBoard/Perfetto
        run_steps()

    stats = time_fn(lambda: forward(variables, batch), iters=10)
    print(stats["mean_ms"], stats["items_per_sec"])
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """jax.profiler trace scope; the trace lands in ``logdir``."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable[[], object],
    iters: int = 10,
    warmup: int = 2,
    items_per_call: int = 1,
) -> dict:
    """Wall-clock a device function with proper synchronization."""
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - start)
    mean = sum(times) / len(times)
    return {
        "mean_ms": mean * 1e3,
        "min_ms": min(times) * 1e3,
        "max_ms": max(times) * 1e3,
        "items_per_sec": items_per_call / mean if mean > 0 else float("inf"),
        "times": times,
    }


def device_memory_stats(device=None) -> Optional[dict]:
    """Live/peak HBM usage when the backend exposes it."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    return stats() if callable(stats) else None
