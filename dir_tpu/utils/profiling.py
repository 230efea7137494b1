"""Profiling / timing harness (SURVEY §5: the reference has none).

Thin wrappers over jax.profiler plus a block-until-ready throughput
timer used by bench.py and tools/bench_components.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 3) -> float:
    """Seconds per call of a jitted fn, after warmup, device-synced."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput(fn: Callable, *args, batch: int, iters: int = 10,
               warmup: int = 3) -> float:
    """Items/sec of a jitted fn over a fixed batch."""
    return batch / time_fn(fn, *args, iters=iters, warmup=warmup)
