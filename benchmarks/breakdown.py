"""Component-level timing breakdown on the current backend.

Run: python benchmarks/breakdown.py
"""

from __future__ import annotations

# Make the repo root importable no matter where this script is launched
# from (round-2 on-device runs died on `ModuleNotFoundError: lynx_tpu`).
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main() -> None:
    import lynx_tpu as lt
    from lynx_tpu.functional import track
    from lynx_tpu.models import ares_ea_segment
    from lynx_tpu.ops.histogram import weighted_histogram_2d

    key = jax.random.PRNGKey(0)

    # 1. Pure particle tracking, no screen.
    segment = ares_ea_segment()
    segment.AREABSCR1.is_active = False
    segment.AREAMQZM1.k1 = jnp.array([4.2])
    beam = lt.ParticleBeam.from_parameters(
        num_particles=100_000, sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]), energy=jnp.array([1.073e8]), key=key,
    )
    t = timeit(jax.jit(lambda s, b: track(s, b)[0].particles), segment, beam)
    print(f"track 100k particles, no screen:      {t*1e3:8.3f} ms")

    # 2. Screen histogram alone (2448x2040).
    xs = beam.xs
    ys = beam.ys
    w = jnp.ones_like(xs)
    hist = jax.jit(
        lambda x, y, w: weighted_histogram_2d(
            x, y, w, (-4e-3, 4e-3), (-3e-3, 3e-3), (2448, 2040)
        )
    )
    t = timeit(hist, xs, ys, w)
    print(f"screen histogram 100k -> 2448x2040:   {t*1e3:8.3f} ms")

    # 2b. Windowed MXU histogram on the same inputs (the TPU screen path).
    from lynx_tpu.ops.histogram import windowed_matmul_histogram_2d

    # The source-beam spot here is ~480 x 540 px, so use a window that
    # actually contains it (the at-screen flagship spot uses (256, 1024)).
    whist = jax.jit(
        lambda x, y, w: windowed_matmul_histogram_2d(
            x, y, w, (-4e-3, 4e-3), (-3e-3, 3e-3), (2448, 2040),
            window=(512, 1024), bf16_exact_weights=True,
        )
    )
    t = timeit(whist, xs, ys, w)
    print(f"windowed MXU histogram (512x1024 win):{t*1e3:8.3f} ms")

    # 3. Full flagship (track + screen).
    segment.AREABSCR1.is_active = True
    t = timeit(jax.jit(lambda s, b: track(s, b)[1]["AREABSCR1"]), segment, beam)
    print(f"track + screen read (flagship):       {t*1e3:8.3f} ms")

    # 4. Batched ParameterBeam settings sweep (the RL env analog).
    for batch in (1000, 10000, 100000):
        seg_b = ares_ea_segment().broadcast((batch,))
        seg_b.AREABSCR1.is_active = False
        seg_b.AREAMQZM1.k1 = jnp.linspace(-10, 10, batch)
        pbeam = lt.ParameterBeam.from_parameters(
            sigma_x=jnp.full((batch,), 1.75e-4), energy=jnp.full((batch,), 1.073e8)
        )
        t = timeit(jax.jit(lambda s, b: track(s, b)[0].sigma_x), seg_b, pbeam)
        print(
            f"ParameterBeam sweep batch={batch:6d}:     {t*1e3:8.3f} ms"
            f"  -> {batch/t/1e6:8.3f} M env-steps/s"
        )

    # 5. Batched ParticleBeam (10k particles x batch settings).
    for batch in (10, 100):
        seg_b = ares_ea_segment().broadcast((batch,))
        seg_b.AREABSCR1.is_active = False
        seg_b.AREAMQZM1.k1 = jnp.linspace(-10, 10, batch)
        pb = lt.ParticleBeam.from_parameters(
            num_particles=10_000,
            sigma_x=jnp.full((batch,), 1.75e-4),
            energy=jnp.full((batch,), 1.073e8),
            key=key,
        )
        t = timeit(jax.jit(lambda s, b: track(s, b)[0].sigma_x), seg_b, pb)
        print(
            f"ParticleBeam 10k x batch={batch:4d}:        {t*1e3:8.3f} ms"
            f"  -> {batch/t/1e3:8.1f} k tracks/s"
        )

    # 6. Gradient step on the flagship.
    segment.AREABSCR1.is_active = False

    def loss(seg, beam):
        out, _ = track(seg, beam)
        return jnp.sum(out.sigma_x**2)

    t = timeit(jax.jit(jax.grad(loss)), segment, beam)
    print(f"grad step 100k particles:             {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
