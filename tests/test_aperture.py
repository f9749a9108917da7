"""Aperture survival-mask semantics (SURVEY.md §4 categories 1 and 4)."""

import jax
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt


def _beam(n=20_000):
    return lt.ParticleBeam.from_parameters(
        num_particles=n,
        sigma_x=jnp.array([1e-4]),
        sigma_y=jnp.array([1e-4]),
        energy=jnp.array([1e8]),
    )


def test_rectangular_aperture_survivor_count_matches_mask():
    beam = _beam()
    aperture = lt.Aperture(
        x_max=jnp.array([1e-4]), y_max=jnp.array([2e-4]), shape="rectangular"
    )
    outgoing = aperture.track(beam)
    expected = np.sum(
        (np.abs(np.asarray(beam.xs[0])) < 1e-4)
        & (np.abs(np.asarray(beam.ys[0])) < 2e-4)
    )
    assert float(outgoing.num_particles_survived[0]) == expected
    # Static shape preserved
    assert outgoing.num_particles == beam.num_particles


def test_elliptical_aperture_survivor_count_matches_mask():
    beam = _beam()
    aperture = lt.Aperture(
        x_max=jnp.array([1e-4]), y_max=jnp.array([2e-4]), shape="elliptical"
    )
    outgoing = aperture.track(beam)
    xs = np.asarray(beam.xs[0])
    ys = np.asarray(beam.ys[0])
    expected = np.sum(xs**2 / 1e-4**2 + ys**2 / 2e-4**2 <= 1.0)
    assert float(outgoing.num_particles_survived[0]) == expected
    # Elliptical cuts more than the circumscribed rectangle
    rect = lt.Aperture(
        x_max=jnp.array([1e-4]), y_max=jnp.array([2e-4]), shape="rectangular"
    )
    assert float(outgoing.num_particles_survived[0]) <= float(
        rect.track(beam).num_particles_survived[0]
    )


def test_aperture_cuts_total_charge():
    beam = lt.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_x=jnp.array([1e-4]),
        total_charge=jnp.array([1e-12]),
    )
    aperture = lt.Aperture(x_max=jnp.array([1e-4]), y_max=jnp.array([1.0]))
    outgoing = aperture.track(beam)
    assert float(outgoing.total_charge[0]) < 1e-12
    survived_fraction = float(outgoing.num_particles_survived[0]) / 10_000
    np.testing.assert_allclose(
        float(outgoing.total_charge[0]), 1e-12 * survived_fraction, rtol=1e-5
    )


def test_inactive_aperture_is_noop():
    beam = _beam(1000)
    aperture = lt.Aperture(
        x_max=jnp.array([1e-9]), y_max=jnp.array([1e-9]), is_active=False
    )
    outgoing = aperture.track(beam)
    assert outgoing is beam


def test_aperture_noop_for_parameter_beam():
    beam = lt.ParameterBeam.from_parameters(sigma_x=jnp.array([1e-4]))
    aperture = lt.Aperture(x_max=jnp.array([1e-9]), y_max=jnp.array([1e-9]))
    assert aperture.track(beam) is beam


def test_all_lost_returns_empty_and_propagates():
    segment = lt.Segment(
        [
            lt.Aperture(x_max=jnp.array([1e-12]), y_max=jnp.array([1e-12])),
            lt.Drift(length=jnp.array([1.0])),
            lt.BPM(is_active=True, name="bpm"),
        ]
    )
    outgoing = segment.track(_beam(1000))
    assert outgoing is lt.Beam.empty
    assert segment.bpm.reading is None


def test_consecutive_apertures_accumulate():
    beam = _beam()
    segment = lt.Segment(
        [
            lt.Aperture(x_max=jnp.array([2e-4]), y_max=jnp.array([1.0]), name="a1"),
            lt.Aperture(x_max=jnp.array([1.0]), y_max=jnp.array([1e-4]), name="a2"),
        ]
    )
    outgoing = segment.track(beam)
    xs = np.asarray(beam.xs[0])
    ys = np.asarray(beam.ys[0])
    expected = np.sum((np.abs(xs) < 2e-4) & (np.abs(ys) < 1e-4))
    assert float(outgoing.num_particles_survived[0]) == expected


def test_weighted_statistics_after_cut():
    """Moments after an aperture reflect only the surviving particles."""
    beam = _beam()
    aperture = lt.Aperture(x_max=jnp.array([5e-5]), y_max=jnp.array([1.0]))
    outgoing = aperture.track(beam)
    xs = np.asarray(beam.xs[0])
    ys = np.asarray(beam.ys[0])
    mask = (np.abs(xs) < 5e-5) & (np.abs(ys) < 1.0)
    np.testing.assert_allclose(
        float(outgoing.sigma_x[0]), xs[mask].std(ddof=1), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(outgoing.mu_x[0]), xs[mask].mean(), rtol=1e-3, atol=1e-9
    )


def test_lost_particles_host_side_api():
    """Reference ``aperture.py:93``: after a non-traced track, the aperture
    exposes the lost particles (host-side boolean indexing, outside jit)."""
    beam = lt.ParticleBeam.from_parameters(
        num_particles=2_000,
        sigma_x=jnp.array([2e-4]),
        sigma_y=jnp.array([2e-4]),
        energy=jnp.array([1e8]),
        key=jax.random.PRNGKey(11),
    )
    aperture = lt.Aperture(
        x_max=jnp.array([1e-4]), y_max=jnp.array([1e-4]), name="ap"
    )
    outgoing = lt.Segment([aperture]).track(beam)
    lost = aperture.lost_particles
    assert lost is not None
    survived = int(outgoing.num_particles_survived[0])
    assert lost.shape[0] == beam.num_particles - survived
    assert lost.shape[-1] == 7
    # Every lost particle is actually outside the rectangle.
    outside = (np.abs(np.asarray(lost[..., 0])) >= 1e-4) | (
        np.abs(np.asarray(lost[..., 2])) >= 1e-4
    )
    assert outside.all()
