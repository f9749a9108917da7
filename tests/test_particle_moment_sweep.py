"""Settings-amortized particle moment sweep: one shared cloud, B settings,
particles resident on-chip (``ops/pallas_track.fused_particle_moment_sweep``).

Pins (a) the XLA reference walk against dense broadcast tracking — including
interleaved ACTIVE apertures, the case no moment algebra can express —
(b) the Pallas kernel against the XLA reference in interpreter mode (the
CPU CI analog of the TPU execution), and (c) gradients through the custom
VJP.  Reference workload contract: BASELINE.md:27 / the reference's
(3, 100_000)-settings sweep (``tests/test_vectorized.py:298-321``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import lynx_tpu as lt
import lynx_tpu.ops.pallas_track as pallas_track
from lynx_tpu.accelerator.fused import particle_moment_plan
from lynx_tpu.functional import track
from lynx_tpu.ops.pallas_track import (
    fused_particle_moment_sweep,
    particle_moments_from_sums,
    sweep_particle_moments,
)


@pytest.fixture
def interpreted_pallas(monkeypatch):
    monkeypatch.setattr(
        pallas_track.pl,
        "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", True)


def _beam(n=3000, dtype=jnp.float64):
    return lt.ParticleBeam.from_parameters(
        num_particles=n,
        mu_x=jnp.array([2e-5]),
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        sigma_p=jnp.array([2e-3]),
        energy=jnp.array([1.073e8]),
        key=jax.random.PRNGKey(0),
        dtype=dtype,
    )


def _elements(B, with_aperture, dtype=jnp.float64):
    k1 = jnp.linspace(-8.0, 8.0, B, dtype=dtype)
    first = [
        lt.Drift(jnp.asarray([0.3], dtype), dtype=dtype),
        lt.Quadrupole(jnp.asarray([0.12], dtype), k1=k1, dtype=dtype),
        lt.HorizontalCorrector(
            jnp.asarray([0.02], dtype),
            angle=jnp.asarray([1e-3], dtype),
            dtype=dtype,
        ),
    ]
    rest = [
        lt.Drift(jnp.asarray([0.4], dtype), dtype=dtype),
        lt.Quadrupole(
            jnp.asarray([0.12], dtype),
            k1=jnp.full((B,), 3.0, dtype),
            dtype=dtype,
        ),
        lt.Drift(jnp.asarray([0.2], dtype), dtype=dtype),
    ]
    if with_aperture:
        aperture = [
            lt.Aperture(
                x_max=jnp.asarray([2e-4], dtype),
                y_max=jnp.asarray([3e-4], dtype),
                shape="rectangular",
                is_active=True,
                dtype=dtype,
            )
        ]
    else:
        aperture = []
    return first + aperture + rest


def _sweep(elements, beam, B):
    plan = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    assert plan is not None
    entries, scalars = plan
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    mu, cov, w_sum = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    return (mu, cov), w_sum


def _dense_reference(elements, beam, B):
    outgoing, _ = track(lt.Segment(elements), beam.broadcast((B,)))
    return outgoing


@pytest.mark.parametrize("with_aperture", [False, True])
def test_sweep_matches_dense_tracking(with_aperture):
    B = 6
    beam = _beam()
    elements = _elements(B, with_aperture)
    (mu, cov), w_sum = _sweep(elements, beam, B)
    reference = _dense_reference(elements, beam, B)

    np.testing.assert_allclose(
        np.asarray(w_sum),
        np.asarray(reference.num_particles_survived),
        rtol=1e-12,
    )
    if with_aperture:
        assert float(w_sum.min()) < beam.num_particles  # losses happened
        assert float(w_sum.min()) > 0
    for stat, value in [
        ("mu_x", mu[:, 0]),
        ("mu_y", mu[:, 2]),
        ("sigma_x", jnp.sqrt(cov[:, 0, 0])),
        ("sigma_y", jnp.sqrt(cov[:, 2, 2])),
        ("sigma_p", jnp.sqrt(cov[:, 5, 5])),
    ]:
        np.testing.assert_allclose(
            np.asarray(value),
            np.asarray(getattr(reference, stat)),
            rtol=1e-9,
            atol=1e-18,
            err_msg=stat,
        )


def test_pallas_kernel_matches_reference(interpreted_pallas, monkeypatch):
    B = 5
    beam = _beam(n=700, dtype=jnp.float32)
    elements = _elements(B, with_aperture=True, dtype=jnp.float32)
    plan = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    entries, scalars = plan
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)

    mu_k, cov_k, w_k = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", False)
    mu_r, cov_r, w_r = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_r), rtol=1e-5, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(cov_k), np.asarray(cov_r), rtol=1e-4, atol=1e-14
    )


@pytest.mark.parametrize("with_aperture", [False, True])
def test_packed_gram_kernel_matches_reference(
    interpreted_pallas, monkeypatch, with_aperture
):
    """The packed-Gram route (16 settings per MXU Gram; aperture masks via
    sparse prefix rows; final sums via the exact affine-image sandwich)
    must match the reference walk."""
    monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", True)
    B = 21  # not a multiple of 16: exercises the setting padding
    beam = _beam(n=700, dtype=jnp.float32)
    elements = _elements(B, with_aperture=with_aperture, dtype=jnp.float32)
    plan = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    entries, scalars = plan
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)

    mu_k, cov_k, w_k = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", False)
    mu_r, cov_r, w_r = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_r), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cov_k), np.asarray(cov_r), rtol=1e-3, atol=1e-13
    )


@pytest.mark.slow
def test_packed_gram_multichunk_multigroup_parity(
    interpreted_pallas, monkeypatch
):
    """N spanning several particle chunks AND B well past one 16-setting
    pad group: pins the cross-chunk accumulation invariant.  The v2 kernel
    accumulates into ONE full-size resident output block (constant index
    map), which is revisit-safe by construction; the round-4 kernel keyed
    16-setting output blocks by a group id with the chunk loop outer,
    revisiting each block non-consecutively — Pallas TPU does not
    preserve output buffers across non-consecutive revisits, so it
    silently accumulated stale data exactly at this shape (ADVICE r4)."""
    monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", True)
    monkeypatch.setattr(pallas_track, "_PACK_CHUNK", 4096)
    B = 48  # 3 groups of 16
    beam = _beam(n=20_000, dtype=jnp.float32)  # 5 chunks of 4096
    elements = _elements(B, with_aperture=True, dtype=jnp.float32)
    plan = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    entries, scalars = plan
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)

    mu_k, cov_k, w_k = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", False)
    mu_r, cov_r, w_r = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_r), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cov_k), np.asarray(cov_r), rtol=1e-3, atol=1e-13
    )


def test_packed_vs_walk_precision_bound(interpreted_pallas, monkeypatch):
    """Pins the documented packed-Gram precision trade (STATUS.md): over
    randomized aperture sweeps, the packed kernel's covariances stay within
    1e-4 relative of the walk kernel's, so the 9x-throughput default cannot
    silently degrade.  (On device the gap is MXU rounding, ~4.5e-5; in
    interpret mode both run f32 — the bound must still hold.)"""
    rng = np.random.default_rng(7)
    B = 24
    for trial in range(3):
        beam = lt.ParticleBeam.from_parameters(
            num_particles=1500,
            mu_x=jnp.array([float(rng.uniform(-5e-5, 5e-5))]),
            sigma_x=jnp.array([float(rng.uniform(1e-4, 3e-4))]),
            sigma_y=jnp.array([float(rng.uniform(1e-4, 3e-4))]),
            sigma_p=jnp.array([2e-3]),
            energy=jnp.array([1.073e8]),
            key=jax.random.PRNGKey(100 + trial),
            dtype=jnp.float32,
        )
        elements = [
            lt.Drift(jnp.array([float(rng.uniform(0.1, 0.5))])),
            lt.Quadrupole(
                jnp.array([0.12]),
                k1=jnp.asarray(rng.uniform(-8, 8, B), jnp.float32),
            ),
            lt.Aperture(
                x_max=jnp.array([float(rng.uniform(1.5e-4, 4e-4))]),
                y_max=jnp.array([float(rng.uniform(1.5e-4, 4e-4))]),
                shape=("rectangular", "elliptical")[trial % 2],
                is_active=True,
            ),
            lt.Drift(jnp.array([0.3])),
        ]
        entries, scalars = particle_moment_plan(
            elements,
            beam.energy,
            lambda x: jnp.broadcast_to(
                jnp.reshape(jnp.asarray(x), (-1,)), (B,)
            ),
        )
        particles = beam.particles[0]
        weights = jnp.ones(particles.shape[:1], particles.dtype)

        monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", True)
        mu_p, cov_p, w_p = sweep_particle_moments(
            entries, scalars, particles, weights
        )
        monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", False)
        mu_w, cov_w, w_w = sweep_particle_moments(
            entries, scalars, particles, weights
        )
        np.testing.assert_allclose(
            np.asarray(w_p), np.asarray(w_w), rtol=1e-6
        )
        scale = np.abs(np.asarray(cov_w)).max(axis=(-1, -2), keepdims=True)
        err = np.abs(np.asarray(cov_p) - np.asarray(cov_w))
        bound = np.broadcast_to(1e-4 * scale + 1e-16, err.shape)
        np.testing.assert_array_less(
            err,
            bound,
            err_msg=f"packed cov deviates >1e-4 relative (trial {trial})",
        )


@pytest.mark.slow
def test_sweep_gradients_flow(interpreted_pallas):
    B = 4
    beam = _beam(n=500, dtype=jnp.float32)
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    elements = _elements(B, with_aperture=False, dtype=jnp.float32)
    plan = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    entries, scalars = plan

    def loss(scalars):
        s1, s2, w = fused_particle_moment_sweep(
            entries, scalars, particles, weights
        )
        mu, cov = particle_moments_from_sums(s1, s2, w)
        return jnp.sum(cov[:, 0, 0])

    grads = jax.grad(loss)(scalars)

    def loss_ref(scalars):
        s1, s2, w = pallas_track._moment_sweep_reference(
            entries, scalars, particles, weights
        )
        mu, cov = particle_moments_from_sums(s1, s2, w)
        return jnp.sum(cov[:, 0, 0])

    grads_ref = jax.grad(loss_ref)(scalars)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in grads)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=2e-4, atol=1e-8
        )


@pytest.mark.slow
def test_env_kernel_method_matches_particles():
    env = lt.envs.make_env() if hasattr(lt, "envs") else None
    from lynx_tpu.envs import make_env

    env = make_env()
    beam = _beam(n=4000, dtype=jnp.float32)
    magnets = jax.random.uniform(
        jax.random.PRNGKey(2), (6, env.num_actions), minval=-0.5, maxval=0.5
    )
    kernel = env.batched_particle_beam_parameters(
        magnets, beam, method="kernel"
    )
    dense = env.batched_particle_beam_parameters(
        magnets, beam, method="particles"
    )
    np.testing.assert_allclose(
        np.asarray(kernel), np.asarray(dense), rtol=3e-3, atol=1e-9
    )


def test_packed_handles_multiple_apertures(interpreted_pallas, monkeypatch):
    """Two apertures with distinct prefix maps: each mask must evaluate at
    its own plane (prefix-row encoding), not the final coordinates."""
    monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", True)
    B = 16
    beam = _beam(n=600, dtype=jnp.float32)
    elements = [
        lt.Drift(jnp.array([0.2])),
        lt.Aperture(
            x_max=jnp.array([2.5e-4]), y_max=jnp.array([2.5e-4]),
            is_active=True,
        ),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.linspace(-6, 6, B)),
        lt.Drift(jnp.array([0.5])),
        lt.Aperture(
            x_max=jnp.array([2e-4]), y_max=jnp.array([5e-4]),
            shape="elliptical", is_active=True,
        ),
        lt.Drift(jnp.array([0.1])),
    ]
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    assert sum(e[0] == "aperture" for e in entries) == 2
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    mu_k, cov_k, w_k = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", False)
    mu_r, cov_r, w_r = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_r), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cov_k), np.asarray(cov_r), rtol=1e-3, atol=1e-13
    )
    # Both apertures actually cut.
    dense = _dense_reference(elements, _beam(n=600, dtype=jnp.float32), B)
    np.testing.assert_allclose(
        np.asarray(w_r),
        np.asarray(dense.num_particles_survived),
        rtol=1e-6,
    )
    assert float(jnp.min(w_r)) < 600


def test_walk_kernel_routes_reference_above_vmem_cap(monkeypatch):
    """N beyond the VMEM-resident cap must fall back to the XLA reference
    (not crash) on the walk route."""
    monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", False)
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", True)
    monkeypatch.setattr(pallas_track, "MOMENT_SWEEP_MAX_PARTICLES", 256)
    B = 4
    beam = _beam(n=512, dtype=jnp.float32)  # > the (patched) cap
    elements = _elements(B, with_aperture=True, dtype=jnp.float32)
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    mu, cov, w = sweep_particle_moments(entries, scalars, particles, weights)
    assert bool(jnp.all(jnp.isfinite(mu))) and bool(jnp.all(w > 0))


def test_plan_rejects_active_screen():
    B = 3
    elements = [
        lt.Drift(jnp.array([0.3])),
        lt.Screen(is_active=True),
    ]
    plan = particle_moment_plan(
        elements,
        jnp.array([1e8]),
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    assert plan is None


def test_packed_b_slab_split_parity(interpreted_pallas, monkeypatch):
    """B beyond _PACK_B_SLAB runs as sequential setting slabs (bounding
    the kernel's VMEM transients for arbitrarily large sweeps); results
    must equal the reference walk across the slab boundary."""
    monkeypatch.setattr(pallas_track, "PACKED_MOMENT_SWEEP", True)
    monkeypatch.setattr(pallas_track, "_PACK_B_SLAB", 32)
    B = 80  # 3 slabs: 32 + 32 + 16
    beam = _beam(n=600, dtype=jnp.float32)
    elements = _elements(B, with_aperture=True, dtype=jnp.float32)
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)

    mu_k, cov_k, w_k = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    monkeypatch.setattr(pallas_track, "PARTICLE_MOMENT_SWEEP_PATH", False)
    mu_r, cov_r, w_r = sweep_particle_moments(
        entries, scalars, particles, weights
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_r), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cov_k), np.asarray(cov_r), rtol=1e-3, atol=1e-13
    )


def test_identity_only_plan_requires_batch_size():
    """A plan with no per-setting scalars carries no settings axis: the
    sweep must demand batch_size= instead of silently shaping output by
    the PARTICLE count (review r5)."""
    beam = _beam(n=300, dtype=jnp.float32)
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    identity_layout = tuple(
        tuple(1.0 if i == j else 0.0 for j in range(7)) for i in range(7)
    )
    entries = (("map", identity_layout),)

    with pytest.raises(ValueError, match="batch_size"):
        sweep_particle_moments(entries, (), particles, weights)

    B = 5
    mu, cov, w = sweep_particle_moments(
        entries, (), particles, weights, batch_size=B
    )
    assert mu.shape == (B, 7) and cov.shape == (B, 7, 7) and w.shape == (B,)
    np.testing.assert_allclose(np.asarray(w), 300.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mu[0]),
        np.asarray(mu[1]),
        rtol=1e-7,
        err_msg="identity plan must give identical rows",
    )


def test_chunked_backward_matches_unchunked(interpreted_pallas, monkeypatch):
    """The settings-chunked backward (memory-bounding scan; review r5)
    must produce the same gradients as the single-vjp path."""
    B = 20
    beam = _beam(n=400, dtype=jnp.float32)
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)
    elements = _elements(B, with_aperture=False, dtype=jnp.float32)
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )

    def loss(scalars):
        s1, s2, w = fused_particle_moment_sweep(
            entries, scalars, particles, weights
        )
        mu, cov = particle_moments_from_sums(s1, s2, w)
        return jnp.sum(cov[:, 0, 0]) + jnp.sum(mu[:, 0] ** 2)

    monkeypatch.setattr(pallas_track, "_BWD_SETTING_CHUNK", 1024)
    g_single = jax.grad(loss)(scalars)
    monkeypatch.setattr(pallas_track, "_BWD_SETTING_CHUNK", 8)  # 3 slices
    g_chunked = jax.grad(loss)(scalars)
    for gs, gc in zip(g_single, g_chunked):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gs), rtol=1e-5, atol=1e-10
        )
