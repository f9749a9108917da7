"""Fused Pallas sweep kernel: correctness in interpreter mode (the CPU CI
analog of the TPU execution; the TPU path itself is exercised by bench.py
and the flush threshold heuristics are covered here)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import lynx_tpu as lt
import lynx_tpu.ops.pallas_track as pallas_track
from lynx_tpu.accelerator.fused import element_map_builder, fused_flush_supported


@pytest.fixture
def interpreted_pallas(monkeypatch):
    monkeypatch.setattr(
        pallas_track.pl,
        "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )


def _elements(B):
    return [
        lt.Drift(jnp.full((B,), 0.5)),
        lt.Quadrupole(
            jnp.full((B,), 0.23),
            k1=jnp.linspace(-5, 5, B),
            tilt=jnp.full((B,), 0.1),
            misalignment=jnp.stack(
                [jnp.full((B,), 1e-4), jnp.full((B,), -2e-4)], axis=-1
            ),
        ),
        lt.HorizontalCorrector(jnp.full((B,), 0.1), angle=jnp.full((B,), 1e-4)),
        lt.VerticalCorrector(jnp.full((B,), 0.1), angle=jnp.full((B,), -1e-4)),
        lt.Cavity(jnp.full((B,), 1.0), voltage=jnp.zeros((B,))),
        lt.Marker(),
    ]


def test_fused_sweep_matches_xla(interpreted_pallas):
    B = pallas_track.TILE
    elements = _elements(B)
    energy = jnp.full((B,), 1.073e8)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4),
        sigma_p=jnp.full((B,), 2e-3),
        energy=energy,
    )
    builders = [element_map_builder(el) for el in elements]
    assert all(b is not None for b in builders)

    out_mu, out_cov = pallas_track.fused_moment_sweep(
        [fn for _, fn in builders],
        [params for params, _ in builders],
        energy,
        beam._mu,
        beam._cov,
    )
    reference = lt.Segment(elements).track(beam)
    np.testing.assert_allclose(
        np.asarray(out_mu), np.asarray(reference._mu), rtol=1e-4, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_cov), np.asarray(reference._cov), rtol=2e-3, atol=1e-16
    )


def test_fused_sweep_pads_ragged_batch(interpreted_pallas):
    B = pallas_track.TILE + 37  # not a multiple of TILE
    elements = [lt.Drift(jnp.full((B,), 0.5))]
    energy = jnp.full((B,), 1e8)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1e-4), energy=energy
    )
    builders = [element_map_builder(el) for el in elements]
    out_mu, out_cov = pallas_track.fused_moment_sweep(
        [fn for _, fn in builders],
        [params for params, _ in builders],
        energy,
        beam._mu,
        beam._cov,
    )
    assert out_mu.shape == (B, 7)
    assert out_cov.shape == (B, 7, 7)
    reference = lt.Segment(elements).track(beam)
    np.testing.assert_allclose(
        np.asarray(out_mu), np.asarray(reference._mu), rtol=1e-4, atol=1e-10
    )


def test_fused_flush_supported_detection():
    assert fused_flush_supported(_elements(4))
    # Every concrete linear element type has a fused builder now.
    assert fused_flush_supported(
        [
            lt.Solenoid(jnp.array([0.5]), k=jnp.array([1.0])),
            lt.Dipole(jnp.array([0.3]), angle=jnp.array([0.1])),
            lt.Undulator(jnp.array([0.4])),
        ]
    )
    # Nested segments are not fusable as single builders.
    nested = lt.Segment([lt.Drift(jnp.array([0.1]))])
    assert not fused_flush_supported([nested])


def test_fused_sweep_with_dipole_solenoid_matches_xla(interpreted_pallas):
    from lynx_tpu.ops import pallas_track

    B = pallas_track.TILE
    elements = [
        lt.Dipole(
            jnp.full((B,), 0.31),
            angle=jnp.full((B,), 0.1),
            e1=jnp.full((B,), 0.05),
            fringe_integral=jnp.full((B,), 0.3),
            gap=jnp.full((B,), 0.05),
        ),
        lt.Solenoid(jnp.full((B,), 0.4), k=jnp.full((B,), 1.1)),
        lt.Undulator(jnp.full((B,), 0.25)),
    ]
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4), energy=energy
    )
    builders = [element_map_builder(el) for el in elements]
    out_mu, out_cov = pallas_track.fused_moment_sweep(
        [fn for _, fn in builders],
        [params for params, _ in builders],
        energy,
        beam._mu,
        beam._cov,
    )
    reference = lt.Segment(elements).track(beam)
    np.testing.assert_allclose(
        np.asarray(out_mu), np.asarray(reference._mu), rtol=1e-4, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_cov), np.asarray(reference._cov), rtol=2e-3, atol=1e-16
    )


def test_table_algebra_identities():
    from lynx_tpu.ops import table as tbl

    identity = tbl.identity_table()
    T = tbl.entries_to_table({(0, 1): jnp.array([0.5]), (1, 6): jnp.array([1e-3])})
    assert tbl.compose(identity, T) == T
    assert tbl.compose(T, identity) == T
    # Literal zero short-circuiting keeps identity cells literal.
    composed = tbl.compose(T, T)
    assert composed[6][6] == 1.0
    assert composed[5][0] == 0.0


def test_fused_particle_sweep_matches_xla(interpreted_pallas):
    from lynx_tpu.ops import pallas_track

    B, N = 4, 1000
    elements = [
        lt.Drift(jnp.full((B,), 0.5)),
        lt.Quadrupole(
            jnp.full((B,), 0.23),
            k1=jnp.linspace(-5, 5, B),
            tilt=jnp.full((B,), 0.1),
        ),
        lt.HorizontalCorrector(jnp.full((B,), 0.1), angle=jnp.full((B,), 1e-4)),
    ]
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.full((B,), 1.75e-4),
        energy=energy,
        key=jax.random.PRNGKey(0),
    )
    builders = [element_map_builder(el) for el in elements]
    out = pallas_track.fused_particle_sweep(
        [fn for _, fn in builders],
        [params for params, _ in builders],
        energy,
        beam.particles,
    )
    reference = lt.Segment(elements).track(beam)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(reference.particles), rtol=1e-4, atol=1e-9
    )


def test_fused_particle_sweep_ragged_n(interpreted_pallas):
    from lynx_tpu.ops import pallas_track

    B, N = 3, pallas_track.PARTICLE_TILE + 77
    elements = [lt.Drift(jnp.full((B,), 0.5))]
    energy = jnp.full((B,), 1e8, dtype=jnp.float32)
    beam = lt.ParticleBeam.from_parameters(
        num_particles=N, sigma_x=jnp.full((B,), 1e-4), energy=energy,
        key=jax.random.PRNGKey(1),
    )
    builders = [element_map_builder(el) for el in elements]
    out = pallas_track.fused_particle_sweep(
        [fn for _, fn in builders],
        [params for params, _ in builders],
        energy,
        beam.particles,
    )
    assert out.shape == (B, N, 7)
    reference = lt.Segment(elements).track(beam)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(reference.particles), rtol=1e-5, atol=1e-10
    )


def test_fused_particle_sweep_gradient_parity(interpreted_pallas):
    """The particle apply kernel's custom VJP (transposed-layout apply for
    particles + einsum for cells) gives parameter and particle gradients
    matching the XLA matmul path at 1e-5."""
    from lynx_tpu.ops import pallas_track

    B, N = 4, 512
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParticleBeam.from_parameters(
        num_particles=N,
        sigma_x=jnp.full((B,), 1.75e-4),
        sigma_p=jnp.full((B,), 2e-3),
        energy=energy,
        key=jax.random.PRNGKey(7),
    )

    def make_elements(k1):
        return [
            lt.Drift(jnp.full((B,), 0.5)),
            lt.Quadrupole(
                jnp.full((B,), 0.23), k1=k1, tilt=jnp.full((B,), 0.1)
            ),
            lt.HorizontalCorrector(
                jnp.full((B,), 0.1), angle=jnp.full((B,), 1e-4)
            ),
        ]

    def loss_fused(k1, particles):
        builders = [element_map_builder(el) for el in make_elements(k1)]
        out = pallas_track.fused_particle_sweep(
            [fn for _, fn in builders],
            [params for params, _ in builders],
            energy,
            particles,
        )
        return jnp.sum(out[..., 0] ** 2) * 1e6

    def loss_reference(k1, particles):
        out = lt.Segment(make_elements(k1)).track(
            lt.ParticleBeam(particles, energy)
        )
        return jnp.sum(out.particles[..., 0] ** 2) * 1e6

    k1 = jnp.linspace(-5, 5, B)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(k1, beam.particles)
    g_ref = jax.grad(loss_reference, argnums=(0, 1))(k1, beam.particles)
    for fused_leaf, ref_leaf in zip(g_fused, g_ref):
        assert np.all(np.isfinite(np.asarray(fused_leaf)))
        np.testing.assert_allclose(
            np.asarray(fused_leaf),
            np.asarray(ref_leaf),
            rtol=1e-5,
            atol=1e-5 * max(1.0, float(np.max(np.abs(np.asarray(ref_leaf))))),
        )


def test_fused_sweep_gradient_flows(interpreted_pallas):
    """jax.grad works through the fused sweep (custom VJP: backward runs the
    XLA table reference) and matches the gradient of the pure table path."""
    from lynx_tpu.ops import pallas_track

    B = pallas_track.TILE
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4), energy=energy
    )

    def loss_fused(k1):
        elements = [
            lt.Drift(jnp.full((B,), 0.5)),
            lt.Quadrupole(jnp.full((B,), 0.23), k1=k1),
        ]
        builders = [element_map_builder(el) for el in elements]
        out_mu, out_cov = pallas_track.fused_moment_sweep(
            [fn for _, fn in builders],
            [params for params, _ in builders],
            energy,
            beam._mu,
            beam._cov,
        )
        return jnp.sum(out_cov[:, 0, 0]) * 1e6

    def loss_reference(k1):
        segment = lt.Segment(
            [
                lt.Drift(jnp.full((B,), 0.5)),
                lt.Quadrupole(jnp.full((B,), 0.23), k1=k1),
            ]
        )
        out = segment.track(beam)
        return jnp.sum(out._cov[:, 0, 0]) * 1e6

    k1 = jnp.linspace(-5, 5, B)
    g_fused = jax.grad(loss_fused)(k1)
    g_ref = jax.grad(loss_reference)(k1)
    assert np.all(np.isfinite(np.asarray(g_fused)))
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-10
    )


def test_fused_backward_full_vjp_parity(interpreted_pallas):
    """The fused Pallas backward kernel's cotangents (params, energy, mu,
    cov) match jax.vjp of the XLA table reference at 1e-6 — the VERDICT r1
    item-3 done-criterion — over the full element mix (dipole with fringe,
    solenoid, tilted+misaligned quad, correctors, undulator)."""
    from lynx_tpu.ops import pallas_track
    from lynx_tpu.ops.pallas_track import _table_reference_sweep

    B = 192  # deliberately not a multiple of the tile (exercises padding)
    elements = [
        lt.Dipole(
            jnp.full((B,), 0.31),
            angle=jnp.full((B,), 0.1),
            e1=jnp.full((B,), 0.05),
            fringe_integral=jnp.full((B,), 0.3),
            gap=jnp.full((B,), 0.05),
        ),
        lt.Quadrupole(
            jnp.full((B,), 0.23),
            k1=jnp.linspace(-5, 5, B),
            tilt=jnp.full((B,), 0.1),
            misalignment=jnp.stack(
                [jnp.full((B,), 1e-4), jnp.full((B,), -2e-4)], axis=-1
            ),
        ),
        lt.Solenoid(jnp.full((B,), 0.4), k=jnp.full((B,), 1.1)),
        lt.HorizontalCorrector(jnp.full((B,), 0.1), angle=jnp.full((B,), 1e-4)),
        lt.Undulator(jnp.full((B,), 0.25)),
    ]
    energy = jnp.full((B,), 1.073e8, dtype=jnp.float32)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4),
        sigma_p=jnp.full((B,), 2e-3),
        energy=energy,
    )
    builders = [element_map_builder(el) for el in elements]
    build_fns = [fn for _, fn in builders]
    element_params = [params for params, _ in builders]
    n_params = tuple(len(p) for p in element_params)
    flat_params = tuple(p for params in element_params for p in params)

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    dmu = jax.random.normal(k1, (B, 7), dtype=jnp.float32)
    dcov = jax.random.normal(k2, (B, 7, 7), dtype=jnp.float32)

    # Fused Pallas backward.
    d_fused = pallas_track._fused_moment_sweep_bwd_impl(
        build_fns, n_params, flat_params, energy, beam._mu, beam._cov, dmu, dcov
    )
    # XLA table-reference VJP at the same inputs/cotangents.
    _, vjp = jax.vjp(
        lambda fp, e, m, c: _table_reference_sweep(
            build_fns, n_params, fp, e, m, c
        ),
        flat_params,
        energy,
        beam._mu,
        beam._cov,
    )
    d_ref = vjp((dmu, dcov))

    for fused_leaf, ref_leaf in zip(
        jax.tree_util.tree_leaves(d_fused), jax.tree_util.tree_leaves(d_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(fused_leaf),
            np.asarray(ref_leaf),
            rtol=1e-6,
            atol=1e-6 * max(1.0, float(np.max(np.abs(np.asarray(ref_leaf))))),
        )
