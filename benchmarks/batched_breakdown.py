"""Stage-level serial-vs-batched A/B of the flagship track (VERDICT r3
next #4: batched B=8 dispatch measured SLOWER than serial on TPU —
2,597 vs 3,053 tracks/s — find the stage that loses, or the crossover
batch).

Stages, each timed serial (B=1) and batched (configurable B list):

  push  — particle tracking only (screen inactive)
  hist  — the windowed screen histogram alone on post-track coordinates
  flag  — full flagship (track + screen read)

Prints one JSON line per (stage, B).
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json

import jax
import jax.numpy as jnp


def _setup(B, num_particles):
    import lynx_tpu as lt
    from __graft_entry__ import _flagship

    batch_shape = () if B == 1 else (B,)
    segment, beam = _flagship(
        num_particles=num_particles, batch_shape=batch_shape
    )
    return segment, beam


def measure_stage(stage, B, num_particles):
    import lynx_tpu as lt
    from lynx_tpu.functional import track
    from lynx_tpu.profiling import marginal_seconds_per_iter

    segment, beam = _setup(B, num_particles)

    def rebeam(particles):
        return lt.ParticleBeam(
            particles,
            beam.energy,
            particle_charges=beam.particle_charges,
            survival=beam.survival,
        )

    if stage == "push":
        segment.AREABSCR1.is_active = False

        def step(p):
            out = track(segment, rebeam(p))[0].particles
            return jnp.clip(out, -10.0, 10.0)

        seconds = marginal_seconds_per_iter(step, beam.particles, 16, 256)
    elif stage == "hist":
        from lynx_tpu.accelerator.screen import screen_reading_particle

        segment.AREABSCR1.is_active = False
        out, _ = track(segment, beam)
        at_screen = rebeam(out.particles)
        screen = segment.AREABSCR1

        def step(carry):
            p, eps = carry
            image = screen_reading_particle(
                rebeam(p + eps),
                screen.resolution,
                screen.pixel_size,
                screen.binning,
                histogram_window=screen.histogram_window,
            )
            return p, jnp.sum(image**2) * jnp.float32(1e-30)

        seconds = marginal_seconds_per_iter(
            step, (at_screen.particles, jnp.float32(0)), 16, 256
        )
    elif stage == "flag":

        def step(carry):
            p, eps = carry
            image = track(segment, rebeam(p + eps))[1]["AREABSCR1"]
            return p, jnp.sum(image) * jnp.float32(1e-30)

        seconds = marginal_seconds_per_iter(
            step, (beam.particles, jnp.float32(0)), 16, 256
        )
    else:
        raise ValueError(stage)
    return seconds


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--particles", type=int, default=100_000)
    parser.add_argument("--batches", default="1,8,32")
    parser.add_argument("--stages", default="push,hist,flag")
    args = parser.parse_args()

    for stage in args.stages.split(","):
        for B in (int(b) for b in args.batches.split(",")):
            try:
                seconds = measure_stage(stage, B, args.particles)
                record = {
                    "stage": stage,
                    "batch": B,
                    "ms_per_dispatch": round(seconds * 1e3, 3),
                    "tracks_per_s": round(B / seconds, 1),
                }
            except Exception as error:  # pragma: no cover
                record = {
                    "stage": stage,
                    "batch": B,
                    "error": repr(error)[:300],
                }
            print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
