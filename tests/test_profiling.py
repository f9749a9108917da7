"""Profiling-subsystem tests (SURVEY §5: tracing/profiling, new work)."""

import pathlib

import jax
import jax.numpy as jnp

from lynx_tpu.profiling import benchmark, trace


def test_benchmark_returns_positive_seconds():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.arange(1024.0)
    seconds = benchmark(f, x, iters=5, warmup=1)
    assert seconds > 0
    assert seconds < 10


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.arange(16.0).sum())
    produced = list(pathlib.Path(tmp_path).rglob("*"))
    assert produced, "profiler trace produced no files"
