"""Profiling hooks (SURVEY.md §5: the tracing/profiling subsystem the
reference lacks).

Measurement integrity note.  On remotely-attached accelerators (and any
async-dispatch PJRT backend), ``jax.block_until_ready`` may return when the
dispatch is *acknowledged*, not when the compute completes — measured on
the round-3 TPU tunnel, a pipelined 8192x8192 bf16 matmul "achieved" 187x
the chip's physical peak that way.  The only trustworthy timestamp is a
device->host VALUE FETCH of a result that data-depends on every iteration.
:func:`marginal_seconds_per_iter` is the harness built on that: it chains
K loop-carried iterations inside ONE jitted program, times a scalar fetch,
and differences two K values so the (large, ~tens of ms) fixed tunnel/fetch
latency cancels.  All repo benchmarks use it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp


@contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters: int = 30, warmup: int = 2) -> float:
    """Steady-state seconds-per-call of ``fn``, timed by fetching each
    result to the host (safe on async-dispatch backends; includes the
    per-call dispatch/fetch overhead — use
    :func:`marginal_seconds_per_iter` for device-compute time)."""
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    start = time.perf_counter()
    for _ in range(iters):
        _fetch(fn(*args))
    return (time.perf_counter() - start) / iters


def _fetch(out) -> float:
    """Force completion: reduce every output leaf to one scalar and pull it
    to the host."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    total = 0.0
    for leaf in leaves:
        # jnp.sum of a potentially non-finite array is fine — we only need
        # the bytes to exist on the host.
        total += float(jnp.sum(jnp.asarray(leaf, dtype=jnp.float32)))
    return total


def marginal_seconds_per_iter(
    step_fn,
    init_carry,
    k_small: int = 16,
    k_large: int = 256,
    repeats: int = 3,
) -> float:
    """True device seconds per iteration of ``step_fn``.

    ``step_fn(carry) -> carry`` must be a pure function whose output
    data-depends on its input (the harness chains it ``K`` times inside one
    jitted ``fori_loop``, so the compiler cannot hoist, CSE, or overlap
    iterations).  The measured quantity is::

        (t_fetch(k_large) - t_fetch(k_small)) / (k_large - k_small)

    which cancels the fixed dispatch + fetch latency of the backend (tens
    of milliseconds through a remote-TPU tunnel).  The minimum over
    ``repeats`` trials is returned (timing noise is strictly additive).

    Pick ``k_large`` so that ``k_large * t_iter`` comfortably exceeds the
    fixed latency's trial-to-trial noise (~3 ms on the tunnel): at the
    default 256, per-iteration costs down to ~15 us resolve cleanly.
    Note loop carries that fit on-chip memory stay resident across
    iterations — the measured figure is then the jit-production rate for
    loop workloads (RL envs, tuners), not a cold-HBM streaming rate.
    """

    def run(K: int) -> float:
        @jax.jit
        def chained(carry):
            return jax.lax.fori_loop(0, K, lambda i, c: step_fn(c), carry)

        out = chained(init_carry)  # compile + warm
        _fetch(out)
        best = float("inf")
        for _ in range(repeats):
            start = time.perf_counter()
            _fetch(chained(init_carry))
            best = min(best, time.perf_counter() - start)
        return best

    t_small = run(k_small)
    t_large = run(k_large)
    return max((t_large - t_small) / (k_large - k_small), 1e-12)


def chain_with_scalar(fn, perturb, out_to_scalar=None):
    """Adapt ``fn(*args) -> out`` into a loop-carried ``step(carry)`` for
    :func:`marginal_seconds_per_iter`.

    ``carry = (args, eps)`` where ``eps`` is an f32 scalar derived from the
    previous output; ``perturb(args, eps) -> args`` must inject ``eps``
    into the inputs in a numerically negligible way (e.g. ``x + eps``
    with ``eps ~ out_sum * 1e-30``) so every iteration genuinely depends
    on the previous one without changing the workload.
    """
    out_to_scalar = out_to_scalar or (
        lambda out: sum(
            jnp.sum(leaf).astype(jnp.float32)
            for leaf in jax.tree.leaves(out)
            if hasattr(leaf, "dtype")
        )
    )

    def step(carry):
        args, eps = carry
        args = perturb(args, eps)
        out = fn(*args)
        return args, out_to_scalar(out) * jnp.float32(1e-30)

    return step
