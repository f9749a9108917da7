"""On-device validation of the round-2 Pallas paths, in one serial run.

Order matters on the remote-TPU tunnel (serial dispatch, tiny shapes before
big ones so a Mosaic lowering failure surfaces cheaply):

  1. windowed MXU histogram: compiles + matches the scatter path (tiny, then
     the full 2448x2040 ARES screen shape),
  2. fused moment-sweep backward kernel: gradient parity vs the XLA table
     path at a small batch,
  3. reworked fused particle sweep: forward parity vs the XLA matmul path.

Prints one JSON line per check; exits non-zero on the first failure.
Run the A/B benches (`particle_ab.py`) and `bench.py` only after this is
green.
"""

from __future__ import annotations

# Make the repo root importable no matter where this script is launched
# from (round-2 on-device runs died on `ModuleNotFoundError: lynx_tpu`).
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _report(name, ok, extra=None):
    line = {"check": name, "ok": bool(ok)}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    if not ok:
        raise SystemExit(f"validation failed: {name}")


def check_histogram():
    from lynx_tpu.ops import histogram as h

    key = jax.random.PRNGKey(0)
    # Small shape first — but bins must EXCEED the 512-window on both axes
    # or windowed_matmul_histogram_2d early-returns the scatter path and the
    # kernel is never exercised (the round-2 "tiny" case silently did
    # that).  Then the full ARES screen serial AND batched (the batched
    # case is the round-2 Mosaic-lowering crash: VERDICT r2 weak #1).
    cases = (
        ((640, 1024), (), 4096),
        ((2448, 2040), (), 100_000),
        ((2448, 2040), (8,), 100_000),
    )
    for bins, batch, n in cases:
        kx, ky, kw = jax.random.split(
            jax.random.fold_in(key, bins[0] + 31 * len(batch)), 3
        )
        shape = (*batch, n)
        x = 0.5 + 0.01 * jax.random.normal(kx, shape)
        y = 0.5 + 0.01 * jax.random.normal(ky, shape)
        w = jax.random.uniform(kw, shape)
        t0 = time.perf_counter()
        windowed = jax.jit(
            lambda x, y, w: h.windowed_matmul_histogram_2d(
                x, y, w, (0.0, 1.0), (0.0, 1.0), bins
            )
        )(x, y, w)
        windowed.block_until_ready()
        compile_s = time.perf_counter() - t0
        scatter = jax.jit(
            lambda x, y, w: h.weighted_histogram_2d(
                x, y, w, (0.0, 1.0), (0.0, 1.0), bins
            )
        )(x, y, w)
        diff = float(jnp.max(jnp.abs(windowed - scatter)))
        total = float(jnp.sum(scatter))
        label = f"windowed_histogram_{bins[0]}x{bins[1]}" + (
            f"_b{batch[0]}" if batch else ""
        )
        _report(
            label,
            diff <= 1e-3 * max(total / (n or 1), 1e-6) + 1e-4,
            {"max_abs_diff": diff, "compile_s": round(compile_s, 1)},
        )


def check_histogram_transforms():
    """The kernel x transform matrix for the histogram: user-level vmap
    (must fold into the grid via the custom_vmap rule) and vmap-of-grad
    (vmaps the custom_vjp forward's pallas_call too)."""
    from lynx_tpu.ops import histogram as h

    bins = (2448, 2040)
    n = 50_000
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    x = 0.5 + 0.01 * jax.random.normal(kx, (4, n))
    y = 0.5 + 0.01 * jax.random.normal(ky, (4, n))
    w = jnp.ones((4, n))

    vmapped = jax.jit(
        jax.vmap(
            lambda x, y, w: h.windowed_matmul_histogram_2d(
                x, y, w, (0.0, 1.0), (0.0, 1.0), bins
            )
        )
    )(x, y, w)
    scatter = jax.jit(
        lambda x, y, w: h.weighted_histogram_2d(
            x, y, w, (0.0, 1.0), (0.0, 1.0), bins
        )
    )(x, y, w)
    diff = float(jnp.max(jnp.abs(vmapped - scatter)))
    _report("windowed_histogram_vmap", diff <= 1e-4, {"max_abs_diff": diff})

    def loss(x, y, w):
        img = h.windowed_matmul_histogram_2d(
            x, y, w, (0.0, 1.0), (0.0, 1.0), bins
        )
        return jnp.sum(img**2)

    g = jax.jit(jax.vmap(jax.grad(loss, argnums=2)))(x, y, w)
    ok = bool(jnp.all(jnp.isfinite(g))) and bool(jnp.any(g != 0))
    _report("windowed_histogram_vmap_grad", ok, {"shape": list(g.shape)})


def check_fused_backward():
    import lynx_tpu as lt
    from lynx_tpu.accelerator.fused import element_map_builder
    from lynx_tpu.ops import pallas_track

    B = pallas_track.TILE
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4),
        sigma_p=jnp.full((B,), 2e-3),
        energy=energy,
    )

    def loss(k1, use_pallas):
        elements = [
            lt.Drift(jnp.full((B,), 0.5)),
            lt.Quadrupole(jnp.full((B,), 0.23), k1=k1, tilt=jnp.full((B,), 0.1)),
            lt.Solenoid(jnp.full((B,), 0.4), k=jnp.full((B,), 1.1)),
        ]
        builders = [element_map_builder(el) for el in elements]
        if use_pallas:
            out_mu, out_cov = pallas_track.fused_moment_sweep(
                [fn for _, fn in builders],
                [params for params, _ in builders],
                energy, beam._mu, beam._cov,
            )
        else:
            n_params = tuple(len(p) for p, _ in builders)
            flat = tuple(p for params, _ in builders for p in params)
            out_mu, out_cov = pallas_track._table_reference_sweep(
                pallas_track._dyn_entries(
                    [fn for _, fn in builders], n_params
                ),
                flat, energy, beam._mu, beam._cov,
            )
        return jnp.sum(out_cov[:, 0, 0]) * 1e6

    k1 = jnp.linspace(-5, 5, B)
    g_pallas = jax.jit(jax.grad(lambda k: loss(k, True)))(k1)
    g_ref = jax.jit(jax.grad(lambda k: loss(k, False)))(k1)
    diff = float(jnp.max(jnp.abs(g_pallas - g_ref)))
    scale = float(jnp.max(jnp.abs(g_ref)))
    _report(
        "fused_moment_backward", diff <= 1e-4 * max(scale, 1.0),
        {"max_abs_diff": diff, "grad_scale": scale},
    )


def check_particle_sweep():
    import lynx_tpu as lt
    from lynx_tpu.accelerator import segment as segment_mod
    from lynx_tpu.models import ares_ea_segment

    B, N = 32, 10_000
    segment = ares_ea_segment().broadcast((B,))
    segment.AREABSCR1.is_active = False
    segment.AREAMQZM1.k1 = jnp.linspace(-5.0, 5.0, B)
    beam = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.full((B,), 1.75e-4),
        energy=jnp.full((B,), 1.073e8),
        key=jax.random.PRNGKey(2),
    )
    flat = segment.flattened().elements
    fused = jax.jit(
        lambda b: segment_mod._fused_particle_flush(flat, b).particles
    )(beam)
    # Pin the auto-route OFF for the reference branch — at this (B, N) the
    # adjudicated default would route track() through the very kernel
    # under test.
    segment_mod.PARTICLE_SWEEP_PATH = False
    try:
        default = jax.jit(lambda b: segment.track(b).particles)(beam)
    finally:
        segment_mod.PARTICLE_SWEEP_PATH = None
    diff = float(jnp.max(jnp.abs(fused - default)))
    scale = float(jnp.max(jnp.abs(default)))
    _report(
        "fused_particle_sweep", diff <= 1e-4 * max(scale, 1e-3),
        {"max_abs_diff": diff},
    )

    # Gradient parity for the same sweep (the transform matrix's
    # particle-sweep x grad cell).
    def loss(k1, use_pallas):
        seg = segment
        seg.AREAMQZM1.k1 = k1
        flat = seg.flattened().elements
        if use_pallas:
            out = segment_mod._fused_particle_flush(flat, beam)
        else:
            out = seg.track(beam)
        return jnp.sum(out.sigma_x)

    k1 = jnp.linspace(-5.0, 5.0, B)
    g_pallas = jax.jit(jax.grad(lambda k: loss(k, True)))(k1)
    segment_mod.PARTICLE_SWEEP_PATH = False
    try:
        g_ref = jax.jit(jax.grad(lambda k: loss(k, False)))(k1)
    finally:
        segment_mod.PARTICLE_SWEEP_PATH = None
    diff = float(jnp.max(jnp.abs(g_pallas - g_ref)))
    scale = float(jnp.max(jnp.abs(g_ref)))
    _report(
        "fused_particle_sweep_grad", diff <= 1e-3 * max(scale, 1e-9),
        {"max_abs_diff": diff, "grad_scale": scale},
    )


def check_particle_moment_sweep():
    """Round-4 settings-amortized VMEM-resident moment sweep: on-device
    parity (incl. an interleaved ACTIVE aperture) vs the XLA reference
    walk, fwd + grad."""
    import lynx_tpu as lt
    import lynx_tpu.ops.pallas_track as pt
    from lynx_tpu.accelerator.fused import particle_moment_plan

    B, N = 16, 20_000
    beam = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        energy=jnp.array([1.073e8]),
        key=jax.random.PRNGKey(7),
    )
    elements = [
        lt.Drift(jnp.array([0.3])),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.linspace(-8, 8, B)),
        lt.Aperture(
            x_max=jnp.array([3e-4]), y_max=jnp.array([4e-4]), is_active=True
        ),
        lt.Drift(jnp.array([0.4])),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.full((B,), 3.0)),
    ]
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    particles = beam.particles[0]
    weights = jnp.ones((N,), jnp.float32)

    mu_k, cov_k, w_k = jax.jit(
        lambda s: pt.sweep_particle_moments(entries, s, particles, weights)
    )(scalars)
    pt.PARTICLE_MOMENT_SWEEP_PATH = False
    try:
        mu_r, cov_r, w_r = jax.jit(
            lambda s: pt.sweep_particle_moments(entries, s, particles, weights)
        )(scalars)
    finally:
        pt.PARTICLE_MOMENT_SWEEP_PATH = None
    diff = max(
        float(jnp.max(jnp.abs(mu_k - mu_r))) / max(float(jnp.max(jnp.abs(mu_r))), 1e-9),
        float(jnp.max(jnp.abs(cov_k - cov_r))) / max(float(jnp.max(jnp.abs(cov_r))), 1e-12),
        float(jnp.max(jnp.abs(w_k - w_r))) / N,
    )
    _report(
        "particle_moment_sweep", diff <= 1e-4, {"max_rel_diff": diff}
    )

    def loss(scalars, use_pallas):
        pt.PARTICLE_MOMENT_SWEEP_PATH = True if use_pallas else False
        try:
            mu, cov, w = pt.sweep_particle_moments(
                entries, scalars, particles, weights
            )
        finally:
            pt.PARTICLE_MOMENT_SWEEP_PATH = None
        return jnp.sum(cov[:, 0, 0]) + jnp.sum(mu[:, 0] ** 2)

    g_k = jax.jit(jax.grad(lambda s: loss(s, True)))(scalars)
    g_r = jax.jit(jax.grad(lambda s: loss(s, False)))(scalars)
    gdiff = max(
        float(jnp.max(jnp.abs(a - b)))
        / max(float(jnp.max(jnp.abs(b))), 1e-12)
        for a, b in zip(g_k, g_r)
    )
    # Both routes share the SAME custom-vjp backward (vjp of the reference
    # walk); the residual difference is the packed forward's MXU Gram
    # rounding (4.5e-5) amplified through the moment cotangents —
    # adjudicated at ~3e-3 on device, a deliberate 9x-throughput trade
    # (see _packed_gram_kernel).  Gate at 1e-2.
    _report(
        "particle_moment_sweep_grad", gdiff <= 1e-2, {"max_rel_diff": gdiff}
    )


def check_hoisted_plan():
    """Static-group (const-table) hoisting: the hoisted plan compiles on
    device, matches the all-dynamic kernel, and reports its speedup (the
    hoisting skips per-setting map builds for batch-invariant elements —
    ``benchmarks/README.md``'s VPU-residual candidate)."""
    import lynx_tpu as lt
    from lynx_tpu.accelerator.fused import element_map_builder, plan_run
    from lynx_tpu.ops import pallas_track

    B = 100_000
    one = lambda v: jnp.full((1,), v)  # noqa: E731
    elements = [
        lt.Drift(one(0.5)),
        lt.Quadrupole(one(0.23), k1=jnp.linspace(-5, 5, B)),
        lt.Drift(one(0.3)),
        lt.Dipole(
            one(0.4), angle=one(0.12), e1=one(0.03),
            fringe_integral=one(0.4), gap=one(0.02),
        ),
        lt.Drift(one(0.2)),
        lt.HorizontalCorrector(one(0.1), angle=jnp.linspace(-1e-4, 1e-4, B)),
        lt.Drift(one(0.7)),
    ]
    energy_1 = one(1.073e8)
    energy = jnp.full((B,), 1.073e8)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4),
        sigma_p=jnp.full((B,), 2e-3),
        energy=energy,
    )
    builders = [element_map_builder(el) for el in elements]

    def vec(x):
        return jnp.broadcast_to(x, (B,)).reshape(B)

    plan = plan_run(builders, energy_1, vec)
    all_dyn = [
        ("dyn", fn, [vec(p) for p in params]) for params, fn in builders
    ]
    assert any(kind == "const" for kind, _, _ in plan)

    hoisted_fn = jax.jit(
        lambda m, c: pallas_track.fused_moment_sweep_plan(plan, energy, m, c)
    )
    dyn_fn = jax.jit(
        lambda m, c: pallas_track.fused_moment_sweep_plan(all_dyn, energy, m, c)
    )
    h_mu, h_cov = jax.block_until_ready(hoisted_fn(beam._mu, beam._cov))
    d_mu, d_cov = jax.block_until_ready(dyn_fn(beam._mu, beam._cov))
    diff = max(
        float(jnp.max(jnp.abs(h_mu - d_mu))),
        float(jnp.max(jnp.abs(h_cov - d_cov))),
    )
    scale = float(jnp.max(jnp.abs(d_cov)))

    def timed(fn):
        # Loop-carried delta-K harness: block_until_ready is dispatch-ack
        # only on the remote tunnel (see lynx_tpu.profiling).
        from lynx_tpu.profiling import marginal_seconds_per_iter

        def step(carry):
            mu, eps = carry
            out_mu, out_cov = fn(mu + eps, beam._cov)
            scalar = (jnp.sum(out_mu) + jnp.sum(out_cov)).astype(jnp.float32)
            return mu, scalar * jnp.float32(1e-30)

        # ~60 us/iter needs a large K so the marginal term dominates the
        # tunnel's latency noise under contention.
        return marginal_seconds_per_iter(step, (beam._mu, jnp.float32(0)), 16, 512)

    t_hoisted = timed(hoisted_fn)
    t_dyn = timed(dyn_fn)
    # A marginal estimate at the 1e-12 floor means the delta collapsed
    # into tunnel latency noise (contended chip) — report nulls rather
    # than a fantasy speedup.
    noisy = t_hoisted < 1e-6 or t_dyn < 1e-6
    _report(
        "hoisted_plan_sweep", diff <= 1e-4 * max(scale, 1e-12),
        {
            "max_abs_diff": diff,
            "hoisted_ms": None if noisy else round(t_hoisted * 1e3, 3),
            "all_dyn_ms": None if noisy else round(t_dyn * 1e3, 3),
            "speedup": None if noisy else round(t_dyn / t_hoisted, 2),
        },
    )


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    check_histogram()
    check_histogram_transforms()
    check_fused_backward()
    check_hoisted_plan()
    check_particle_sweep()
    check_particle_moment_sweep()
    print(json.dumps({"check": "all", "ok": True}))
