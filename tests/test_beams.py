"""Beam constructor and transformation tests (reference
``tests/test_parameter_beam.py`` / ``test_particle_beam.py`` analogs)."""

import jax
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt


def test_parameter_beam_transformed_to():
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), sigma_y=jnp.array([2e-4]),
        energy=jnp.array([1e8]),
    )
    moved = beam.transformed_to(
        mu_x=jnp.array([5e-5]),
        sigma_x=jnp.array([3e-4]),
        energy=jnp.array([2e8]),
    )
    np.testing.assert_allclose(float(moved.mu_x[0]), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(moved.sigma_x[0]), 3e-4, rtol=1e-6)
    np.testing.assert_allclose(float(moved.sigma_y[0]), 2e-4, rtol=1e-6)  # kept
    np.testing.assert_allclose(float(moved.energy[0]), 2e8)


def test_particle_beam_transformed_to_preserves_shape_and_stats():
    beam = lt.ParticleBeam.from_parameters(
        num_particles=50_000,
        sigma_x=jnp.array([1e-4]),
        sigma_y=jnp.array([2e-4]),
        key=jax.random.PRNGKey(0),
    )
    moved = beam.transformed_to(
        mu_x=jnp.array([1e-4]), sigma_x=jnp.array([5e-4])
    )
    assert moved.particles.shape == beam.particles.shape
    np.testing.assert_allclose(float(moved.mu_x[0]), 1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(moved.sigma_x[0]), 5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        float(moved.sigma_y[0]), float(beam.sigma_y[0]), rtol=1e-6
    )


def test_particle_beam_transformed_to_charge_rescaling():
    beam = lt.ParticleBeam.from_parameters(
        num_particles=1000, total_charge=jnp.array([2e-12]),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(beam.total_charge[0]), 2e-12, rtol=1e-6)
    rescaled = beam.transformed_to(total_charge=jnp.array([6e-12]))
    np.testing.assert_allclose(float(rescaled.total_charge[0]), 6e-12, rtol=1e-6)


def test_uniform_ellipsoid_bounds_and_stats():
    beam = lt.ParticleBeam.uniform_3d_ellipsoid(
        num_particles=50_000,
        radius_x=jnp.array([2e-3]),
        radius_y=jnp.array([1e-3]),
        radius_s=jnp.array([3e-3]),
        key=jax.random.PRNGKey(0),
    )
    xs = np.asarray(beam.xs[0])
    ys = np.asarray(beam.ys[0])
    ss = np.asarray(beam.ss[0])
    # All particles strictly inside the ellipsoid.
    r2 = xs**2 / 2e-3**2 + ys**2 / 1e-3**2 + ss**2 / 3e-3**2
    assert r2.max() <= 1.0 + 1e-6
    # Uniform-ball marginal: sigma = radius / sqrt(5).
    np.testing.assert_allclose(xs.std(), 2e-3 / np.sqrt(5), rtol=2e-2)
    np.testing.assert_allclose(ys.std(), 1e-3 / np.sqrt(5), rtol=2e-2)
    np.testing.assert_allclose(ss.std(), 3e-3 / np.sqrt(5), rtol=2e-2)


def test_make_linspaced_bounds():
    beam = lt.ParticleBeam.make_linspaced(
        num_particles=11,
        mu_x=jnp.array([1e-4]),
        sigma_x=jnp.array([2e-5]),
    )
    xs = np.asarray(beam.xs[0])
    np.testing.assert_allclose(xs[0], 1e-4 - 2e-5, rtol=1e-6)
    np.testing.assert_allclose(xs[-1], 1e-4 + 2e-5, rtol=1e-6)
    np.testing.assert_allclose(xs[5], 1e-4, rtol=1e-6)
    assert np.all(np.diff(xs) > 0)


def test_from_ocelot_duck_typed_beam():
    class FakeParray:
        import numpy as _np

        rparticles = _np.random.default_rng(0).normal(0, 1e-4, (6, 500))
        q_array = _np.full(500, 1e-15)
        E = 0.1  # GeV

    beam = lt.ParticleBeam.from_ocelot(FakeParray())
    assert beam.num_particles == 500
    np.testing.assert_allclose(float(beam.energy[0]), 1e8)
    np.testing.assert_allclose(float(beam.total_charge[0]), 5e-13, rtol=1e-5)

    parameter = lt.ParameterBeam.from_ocelot(FakeParray())
    np.testing.assert_allclose(
        float(parameter.sigma_x[0]), float(beam.sigma_x[0]), rtol=1e-4
    )
