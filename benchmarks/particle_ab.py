"""On-device A/B of the three ParticleBeam tracking layouts.

Resolves VERDICT r1 item 4 ("resolve the two dormant particle fast paths"):

  a) ``matmul``  — the default dense path: compose the sparse table, densify
     to ``(B, 7, 7)``, push ``(B, N, 7)`` through one batched matmul.
  b) ``rows``    — ``element.PARTICLE_ROWS_PATH``: apply the composed sparse
     table to the 7 coordinate rows ``(B, N)`` directly on the VPU lanes.
  c) ``pallas``  — ``ops/pallas_track.fused_particle_sweep``: compose the
     table's dynamic cells in XLA once per setting, then a Pallas kernel
     streams particle tiles through VMEM (coords on sublanes, particles on
     lanes) applying scalar-prefetched cells.

Each variant is timed forward-only and forward+backward (grad w.r.t. the
two quadrupole strengths), steady-state with a warmup dispatch excluded.

Prints one JSON line per (variant, mode, shape).

Usage: python benchmarks/particle_ab.py [--batch 100] [--particles 10000]
"""

from __future__ import annotations

# Make the repo root importable no matter where this script is launched
# from (round-2 on-device runs died on `ModuleNotFoundError: lynx_tpu`).
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _segment(batch):
    import lynx_tpu as lt
    from lynx_tpu.models import ares_ea_segment

    segment = ares_ea_segment().broadcast((batch,))
    segment.AREABSCR1.is_active = False
    return segment


def _beam(batch, num_particles):
    import lynx_tpu as lt

    return lt.ParticleBeam.from_parameters(
        num_particles=num_particles,
        sigma_x=jnp.full((batch,), 1.75e-4),
        sigma_y=jnp.full((batch,), 1.75e-4),
        energy=jnp.full((batch,), 1.073e8),
        key=jax.random.PRNGKey(0),
    )


def _time_fwd(track_fn, k1, k2, beam, iters=None):
    """True device seconds per forward track via the loop-carried delta-K
    harness (block_until_ready is dispatch-ack only on the remote tunnel;
    see lynx_tpu.profiling).  The PARTICLES are the loop carry — each
    iteration tracks the previous iteration's (clipped) output, so the
    full (B, N, 7) result must be materialized every step and XLA cannot
    algebraically collapse the push (a scalar-sum consumer lets the
    simplifier rewrite sum(P @ R) = sum(P) @ R and skip the workload:
    measured 10 TB/s "throughput" before this fix)."""
    import lynx_tpu as lt
    from lynx_tpu.profiling import marginal_seconds_per_iter

    def step(particles):
        b = lt.ParticleBeam(
            particles, beam.energy,
            particle_charges=beam.particle_charges, survival=beam.survival,
        )
        out = track_fn(k1, k2, b).particles
        # clip: nonlinear (blocks reduce-of-linear rewrites), keeps repeated
        # tracking bounded, and fuses into the push epilogue (free).
        return jnp.clip(out, -10.0, 10.0)

    return marginal_seconds_per_iter(step, beam.particles, 16, 256)


def _time_bwd(loss_fn, k1, k2, beam, iters=None):
    """Seconds per forward+backward call.  The loss (summed sigma_x) is
    quadratic in the particles, so the reverse pass cannot be collapsed by
    the algebraic simplifier; the k1 epsilon chain serializes iterations."""
    from lynx_tpu.profiling import marginal_seconds_per_iter

    grad = jax.grad(loss_fn, argnums=(0, 1))

    def step(carry):
        k, eps = carry
        g1, g2 = grad(k + eps, k2, beam)
        total = (jnp.sum(g1) + jnp.sum(g2)).astype(jnp.float32)
        return k, total * jnp.float32(1e-30)

    return marginal_seconds_per_iter(step, (k1, jnp.float32(0)), 16, 256)


def main(batch, num_particles, iters):
    from lynx_tpu.accelerator import element as element_mod
    from lynx_tpu.accelerator import segment as segment_mod

    segment = _segment(batch)
    beam = _beam(batch, num_particles)
    k1 = jnp.linspace(-5.0, 5.0, batch)
    k2 = jnp.linspace(5.0, -5.0, batch)

    def run(k1, k2, beam):
        segment.AREAMQZM1.k1 = k1
        segment.AREAMQZM2.k1 = k2
        return segment.track(beam)

    def fwd_loss(k1, k2, beam):
        return run(k1, k2, beam).sigma_x.sum()

    def pallas_track(k1, k2, beam):
        segment.AREAMQZM1.k1 = k1
        segment.AREAMQZM2.k1 = k2
        flat = segment.flattened().elements
        assert all(el.is_skippable for el in flat)
        out = segment_mod._fused_particle_flush(flat, beam)
        assert out is not None
        return out

    def pallas_loss(k1, k2, beam):
        return pallas_track(k1, k2, beam).sigma_x.sum()

    variants = {
        "matmul": (run, fwd_loss, {}),
        "rows": (run, fwd_loss, {"rows": True}),
        "pallas": (pallas_track, pallas_loss, {}),
    }

    for name, (track_fn, loss_fn, opts) in variants.items():
        element_mod.PARTICLE_ROWS_PATH = bool(opts.get("rows"))
        # Pin the adjudicated auto-route OFF for the XLA variants — at
        # small N the default would send segment.track through the very
        # pallas kernel we are A/B-ing against.
        segment_mod.PARTICLE_SWEEP_PATH = False
        try:
            t_fwd = _time_fwd(track_fn, k1, k2, beam)
            t_bwd = _time_bwd(loss_fn, k1, k2, beam)
        finally:
            element_mod.PARTICLE_ROWS_PATH = False
            segment_mod.PARTICLE_SWEEP_PATH = None
        for mode, t in (("fwd", t_fwd), ("fwd+bwd", t_bwd)):
            print(
                json.dumps(
                    {
                        "variant": name,
                        "mode": mode,
                        "ms_per_call": round(t * 1e3, 3),
                        "pushes_per_s": round(batch * num_particles / t),
                        "batch": batch,
                        "num_particles": num_particles,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=100)
    parser.add_argument("--particles", type=int, default=10_000)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()
    main(args.batch, args.particles, args.iters)
