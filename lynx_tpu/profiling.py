"""Profiling hooks (SURVEY.md §5: the tracing/profiling subsystem the
reference lacks)."""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters: int = 30, warmup: int = 2) -> float:
    """Steady-state seconds-per-call of ``fn`` (blocks on the result)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters
