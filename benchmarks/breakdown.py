"""Component-level timing breakdown on the current backend.

All timings use the loop-carried delta-K harness
(``lynx_tpu.profiling.marginal_seconds_per_iter``): on the remote-TPU
tunnel, ``block_until_ready`` returns on dispatch-ack, not compute
completion — pipelined timing "measured" 187x the chip's physical peak
(see profiling.py docstring).  Every step below injects a numerically
invisible epsilon from the previous output into the next input, so the
compiler can neither hoist nor overlap iterations, and the timed quantity
is a device->host value fetch.

Run: python benchmarks/breakdown.py
"""

from __future__ import annotations

# Make the repo root importable no matter where this script is launched
# from (round-2 on-device runs died on `ModuleNotFoundError: lynx_tpu`).
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

K_SMALL, K_LARGE = 16, 256


def measure(step_fn, init) -> float:
    from lynx_tpu.profiling import marginal_seconds_per_iter

    # Escalate the chain depth until the marginal sum dominates the
    # tunnel's ~3 ms latency noise (sub-10 us steps at K=256 otherwise
    # collapse to the harness floor and print fantasy rates).
    for k_large in (K_LARGE, 2048, 8192):
        seconds = marginal_seconds_per_iter(step_fn, init, K_SMALL, k_large)
        if seconds * k_large > 2e-3:
            break
    return seconds


def _eps_of(out) -> jnp.ndarray:
    return jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30)


def main() -> None:
    import lynx_tpu as lt
    from lynx_tpu.functional import track
    from lynx_tpu.models import ares_ea_segment
    from lynx_tpu.ops.histogram import weighted_histogram_2d

    key = jax.random.PRNGKey(0)

    # 1. Pure particle tracking, no screen.  Flagship optics (the bench
    # contract, __graft_entry__._flagship): all three quads set — with
    # only AREAMQZM1 powered the spot's y-extent (~1156 px) exceeds any
    # sane histogram window and the flagship row silently measured the
    # scatter-fallback path instead of the windowed kernel.
    segment = ares_ea_segment()
    segment.AREABSCR1.is_active = False
    segment.AREAMQZM1.k1 = jnp.array([4.2])
    segment.AREAMQZM2.k1 = jnp.array([-4.2])
    segment.AREAMQZM3.k1 = jnp.array([2.1])
    beam = lt.ParticleBeam.from_parameters(
        num_particles=100_000, sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]), sigma_xp=jnp.array([2e-5]),
        sigma_yp=jnp.array([2e-5]), sigma_s=jnp.array([8e-6]),
        sigma_p=jnp.array([2e-3]), energy=jnp.array([1.073e8]), key=key,
    )

    def rebeam(particles):
        return lt.ParticleBeam(
            particles, beam.energy,
            particle_charges=beam.particle_charges, survival=beam.survival,
        )

    # The particles ARE the carry (clipped): a scalar-sum consumer would
    # let XLA rewrite sum(P @ R) = sum(P) @ R and skip the push entirely.
    def step_track(p):
        out = track(segment, rebeam(p))[0].particles
        return jnp.clip(out, -10.0, 10.0)

    t = measure(step_track, beam.particles)
    print(f"track 100k particles, no screen:      {t*1e3:8.3f} ms")

    # 2. Screen histogram alone (2448x2040).
    xs, ys = beam.xs, beam.ys
    w = jnp.ones_like(xs)

    def step_hist(carry):
        x, eps = carry
        out = weighted_histogram_2d(
            x + eps, ys, w, (-4e-3, 4e-3), (-3e-3, 3e-3), (2448, 2040)
        )
        # squared consumption: sum(scatter(w)) = sum(w) is a sound rewrite
        # the simplifier might apply; sum(scatter(w)^2) is not.
        return x, _eps_of(out**2)

    t = measure(step_hist, (xs, jnp.float32(0)))
    print(f"screen histogram 100k -> 2448x2040:   {t*1e3:8.3f} ms")

    # 2b. Windowed MXU histogram on the same inputs (the TPU screen path).
    from lynx_tpu.ops.histogram import windowed_matmul_histogram_2d

    def step_whist(carry):
        x, eps = carry
        out = windowed_matmul_histogram_2d(
            x + eps, ys, w, (-4e-3, 4e-3), (-3e-3, 3e-3), (2448, 2040),
            window=(512, 1024), bf16_exact_weights=True,
        )
        return x, _eps_of(out)

    t = measure(step_whist, (xs, jnp.float32(0)))
    print(f"windowed MXU histogram (512x1024 win):{t*1e3:8.3f} ms")

    # 3. Full flagship (track + screen).
    segment.AREABSCR1.is_active = True

    def step_flagship(carry):
        p, eps = carry
        out = track(segment, rebeam(p + eps))[1]["AREABSCR1"]
        return p, _eps_of(out)

    t = measure(step_flagship, (beam.particles, jnp.float32(0)))
    print(f"track + screen read (flagship):       {t*1e3:8.3f} ms")

    # 4. Batched ParameterBeam settings sweep (the RL env analog).
    for batch in (1000, 10000, 100000):
        seg_b = ares_ea_segment().broadcast((batch,))
        seg_b.AREABSCR1.is_active = False
        k1 = jnp.linspace(-10, 10, batch)
        pbeam = lt.ParameterBeam.from_parameters(
            sigma_x=jnp.full((batch,), 1.75e-4), energy=jnp.full((batch,), 1.073e8)
        )

        def step_sweep(carry, seg_b=seg_b, pbeam=pbeam, k1=k1):
            k, eps = carry
            seg_b.AREAMQZM1.k1 = k + eps
            out = track(seg_b, pbeam)[0].sigma_x
            return k, _eps_of(out)

        t = measure(step_sweep, (k1, jnp.float32(0)))
        print(
            f"ParameterBeam sweep batch={batch:6d}:     {t*1e3:8.3f} ms"
            f"  -> {batch/t/1e6:8.3f} M env-steps/s"
        )

    # 5. Batched ParticleBeam (10k particles x batch settings).
    for batch in (10, 100):
        seg_b = ares_ea_segment().broadcast((batch,))
        seg_b.AREABSCR1.is_active = False
        k1 = jnp.linspace(-10, 10, batch)
        pb = lt.ParticleBeam.from_parameters(
            num_particles=10_000,
            sigma_x=jnp.full((batch,), 1.75e-4),
            energy=jnp.full((batch,), 1.073e8),
            key=key,
        )

        def step_pb(carry, seg_b=seg_b, pb=pb, k1=k1):
            # sigma_x is quadratic in the particles — safe to consume as a
            # scalar (no algebraic collapse of the push).
            k, eps = carry
            seg_b.AREAMQZM1.k1 = k + eps
            out = track(seg_b, pb)[0].sigma_x
            return k, _eps_of(out)

        t = measure(step_pb, (k1, jnp.float32(0)))
        print(
            f"ParticleBeam 10k x batch={batch:4d}:        {t*1e3:8.3f} ms"
            f"  -> {batch/t/1e3:8.1f} k tracks/s"
        )

    # 6. Gradient step on the flagship.
    segment.AREABSCR1.is_active = False

    def loss(seg, b):
        out, _ = track(seg, b)
        return jnp.sum(out.sigma_x**2)

    def step_grad(carry):
        p, eps = carry
        g = jax.grad(loss, argnums=1)(segment, rebeam(p + eps))
        # consume the SQUARED gradient: sum(g) is linear in g and could be
        # algebraically collapsed through the (linear) transpose pass.
        return p, _eps_of(g.particles**2)

    t = measure(step_grad, (beam.particles, jnp.float32(0)))
    print(f"grad step 100k particles:             {t*1e3:8.3f} ms")

    roofline()


# TPU v5e (v5 lite) peaks; the bench chip reports "TPU v5 lite".
PEAK_BF16_FLOPS = 197e12  # MXU, bf16 multiply / f32 accumulate
PEAK_INT8_OPS = 394e12  # MXU, int8 x int8 -> int32
PEAK_F32_FLOPS = 49e12  # VPU-fed f32 matmul rate (bf16/4)
PEAK_HBM_BW = 819e9  # bytes/s


def roofline() -> None:
    """Closed-form FLOPs/bytes vs measured time for the three hot kernels
    (VERDICT r2 item 7).  Intensities are low enough that the particle push
    and moment sweep are HBM-bound; the one-hot histogram is MXU-bound."""
    import lynx_tpu as lt
    from lynx_tpu.functional import track as ftrack
    from lynx_tpu.ops.histogram import windowed_matmul_histogram_2d

    print("\n-- roofline (TPU v5e peaks: 197T bf16 FLOP/s, 819 GB/s HBM) --")

    def report(name, seconds, flops, bytes_, peak_flops):
        t_flops = flops / peak_flops
        t_bw = bytes_ / PEAK_HBM_BW
        bound = "MXU" if t_flops >= t_bw else "HBM"
        light = max(t_flops, t_bw)
        print(
            f"{name:38s} {seconds*1e3:8.3f} ms"
            f"  speed-of-light {light*1e3:7.3f} ms ({bound}-bound)"
            f"  -> {100 * light / seconds:5.1f}% of roofline"
        )

    # 1. Particle push: (B, N, 7) x (7, 7) per setting.
    B, N = 32, 100_000
    seg_b = ares_ea_segment_for_roofline(B)
    k1 = jnp.linspace(-10, 10, B)
    pb = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.full((B,), 1.75e-4),
        energy=jnp.full((B,), 1.073e8),
        key=jax.random.PRNGKey(5),
    )

    # Particles are the carry (see step_track).
    def step_push(p):
        b = lt.ParticleBeam(
            p, pb.energy,
            particle_charges=pb.particle_charges, survival=pb.survival,
        )
        out = ftrack(seg_b, b)[0].particles
        return jnp.clip(out, -10.0, 10.0)

    t = measure(step_push, pb.particles)
    # One fused 7x7 affine map applied to every particle: 2*49 FLOPs each;
    # particles stream HBM->VMEM->HBM once: 2 * B*N*7 f32.
    flops = 2 * 49 * B * N
    bytes_ = 2 * B * N * 7 * 4
    report(f"particle push B={B} N={N//1000}k", t, flops, bytes_, PEAK_F32_FLOPS)

    # 2. Fused moment sweep (build+fold+apply) at B=100k.
    B = 100_000
    seg_s = ares_ea_segment_for_roofline(B)
    k1 = jnp.linspace(-10, 10, B)
    pbeam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4), energy=jnp.full((B,), 1.073e8)
    )

    def step_sweep(carry):
        k, eps = carry
        seg_s.AREAMQZM1.k1 = k + eps
        out = ftrack(seg_s, pbeam)[0].sigma_x
        return k, _eps_of(out)

    t = measure(step_sweep, (k1, jnp.float32(0)))
    L = len(seg_s.flattened().elements)
    # Per setting: fold L maps (7x7x7 matmuls) + apply to mu (7x7) and
    # cov (two 7x7x7); bytes: params + mu/cov in/out (the kernel's whole
    # point is that intermediates never touch HBM).
    flops = (2 * 343 * (L - 1) + 2 * 49 + 4 * 343) * B
    bytes_ = (L * 2 + (7 + 49) * 2) * B * 4
    report(f"fused moment sweep B=100k L={L}", t, flops, bytes_, PEAK_F32_FLOPS)

    # 3. Windowed one-hot MXU histogram, flagship window.
    N = 100_000
    kx, ky = jax.random.split(jax.random.PRNGKey(6))
    x = 0.5 + 0.003 * jax.random.normal(kx, (N,))
    y = 0.5 + 0.01 * jax.random.normal(ky, (N,))
    w = jnp.ones((N,))
    win = (256, 1024)

    def step_hist(carry):
        xx, eps = carry
        out = windowed_matmul_histogram_2d(
            xx + eps, y, w, (0.0, 1.0), (0.0, 1.0), (2448, 2040),
            window=win, bf16_exact_weights=True,
        )
        return xx, _eps_of(out)

    t = measure(step_hist, (x, jnp.float32(0)))
    # Two one-hot matmuls' worth of MXU work per particle tile:
    # A^T (B*w) costs 2 * N * win_x * win_y bf16 FLOPs.
    flops = 2 * N * win[0] * win[1]
    bytes_ = 3 * N * 4 + win[0] * win[1] * 4
    report(f"windowed histogram {win[0]}x{win[1]}", t, flops, bytes_, PEAK_BF16_FLOPS)

    # 4. The flagship COUNT read itself (binary weights -> int8 MXU kernel,
    # moment-derived ARES window) — the VERDICT r3 #3 contract row.
    from lynx_tpu.models import ares_ea_segment

    screen = ares_ea_segment().AREABSCR1
    win_c = (screen.histogram_window[1], screen.histogram_window[0])

    def step_count(carry):
        xx, eps = carry
        out = windowed_matmul_histogram_2d(
            xx + eps, y, w, (0.0, 1.0), (0.0, 1.0), (2040, 2448),
            window=win_c, binary_weights=True,
        )
        return xx, _eps_of(out)

    t = measure(step_count, (x, jnp.float32(0)))
    win_x8 = -(-win_c[0] // 8) * 8
    win_y128 = -(-win_c[1] // 128) * 128
    flops = 2 * N * win_x8 * win_y128
    bytes_ = 2 * N * 4 + win_x8 * win_y128 * 4
    report(
        f"flagship COUNT read int8 {win_x8}x{win_y128}",
        t, flops, bytes_, PEAK_INT8_OPS,
    )


def ares_ea_segment_for_roofline(batch):
    from lynx_tpu.models import ares_ea_segment

    seg = ares_ea_segment().broadcast((batch,))
    seg.AREABSCR1.is_active = False
    seg.AREAMQZM1.k1 = jnp.linspace(-10, 10, batch)
    return seg


if __name__ == "__main__":
    main()
