"""On-device A/B: aperture-interleaved ParticleBeam settings sweep —
VMEM-resident moment-sweep kernel vs dense broadcast tracking.

The moment-sufficiency route is exact only for purely linear runs; an
ACTIVE aperture between magnets makes per-setting survival depend on
per-particle positions. This harness measures the two fidelity paths on
that workload (the kernel's design case):

  kernel — ``ops/pallas_track.sweep_particle_moments`` (cloud resident in
           VMEM across all B settings).
  dense  — broadcast ``functional.track`` (per-setting full-cloud pushes
           through each run segment + weighted moment reductions).

Prints one JSON line per (variant, B).
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json

import jax
import jax.numpy as jnp


def _workload(B, N):
    import lynx_tpu as lt

    beam = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        energy=jnp.array([1.073e8]),
        key=jax.random.PRNGKey(0),
    )
    elements = [
        lt.Drift(jnp.array([0.3])),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.linspace(-8.0, 8.0, B)),
        lt.Aperture(
            x_max=jnp.array([3e-4]), y_max=jnp.array([4e-4]), is_active=True
        ),
        lt.Drift(jnp.array([0.4])),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.full((B,), 3.0)),
        lt.Drift(jnp.array([0.2])),
    ]
    return elements, beam


def measure_kernel(B, N):
    import lynx_tpu.ops.pallas_track as pt
    from lynx_tpu.accelerator.fused import particle_moment_plan
    from lynx_tpu.profiling import marginal_seconds_per_iter

    elements, beam = _workload(B, N)
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    particles = beam.particles[0]
    weights = jnp.ones((N,), jnp.float32)

    def step(carry):
        s, eps = carry
        mu, cov, w = pt.sweep_particle_moments(
            entries, tuple(v + eps for v in s), particles, weights
        )
        out = jnp.stack([mu[:, 0], cov[:, 0, 0], mu[:, 2], cov[:, 2, 2]])
        return s, jnp.sum(out) * jnp.float32(1e-30)

    # Escalate K until the marginal resolves above the tunnel's ~3 ms
    # latency noise (the packed kernel iterates in single-digit us).
    for k_large in (256, 2048, 8192):
        per_call = marginal_seconds_per_iter(
            step, (scalars, jnp.float32(0.0)), 16, k_large
        )
        if per_call * k_large > 2e-3:
            break
    return B / per_call


def measure_dense(B, N):
    import lynx_tpu as lt
    from lynx_tpu.functional import track
    from lynx_tpu.profiling import marginal_seconds_per_iter

    elements, beam = _workload(B, N)
    big = beam.broadcast((B,))
    segment = lt.Segment(elements)
    k1 = jnp.linspace(-8.0, 8.0, B)

    def step(carry):
        k, eps = carry
        segment.elements[1].k1 = k + eps
        out, _ = track(segment, big)
        obs = jnp.stack([out.mu_x, out.sigma_x, out.mu_y, out.sigma_y])
        return k, jnp.sum(obs) * jnp.float32(1e-30)

    per_call = marginal_seconds_per_iter(
        step, (k1, jnp.float32(0.0)), 16, 256
    )
    return B / per_call


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--particles", type=int, default=100_000)
    parser.add_argument("--batches", default="32,256")
    parser.add_argument("--variants", default="kernel,dense")
    args = parser.parse_args()
    variants = {"kernel": measure_kernel, "dense": measure_dense}
    for name, fn in ((v, variants[v]) for v in args.variants.split(",")):
        for B in (int(b) for b in args.batches.split(",")):
            try:
                rate = fn(B, args.particles)
                record = {
                    "variant": name,
                    "batch": B,
                    "num_particles": args.particles,
                    "env_steps_per_s": round(rate, 1),
                }
            except Exception as error:  # pragma: no cover
                record = {
                    "variant": name,
                    "batch": B,
                    "error": repr(error)[:300],
                }
            print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
