"""ASTRA import against the golden moments (mirrors reference
``tests/test_astra_import.py``; the fixture is synthesized deterministically
to those moments — see ``tests/resources/astra_fixture.py``)."""

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt
from tests.resources import astra_fixture as golden


def test_particle_beam_golden_moments(astra_beam_path):
    beam = lt.ParticleBeam.from_astra(astra_beam_path, dtype=jnp.float64)
    assert beam.num_particles == golden.N_PARTICLES
    np.testing.assert_allclose(float(beam.energy[0]), golden.ENERGY_EV, rtol=1e-9)
    np.testing.assert_allclose(
        float(beam.total_charge[0]), golden.TOTAL_CHARGE_C, rtol=1e-9
    )
    np.testing.assert_allclose(
        float(beam.sigma_x[0]), golden.SIGMA["x"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(beam.sigma_xp[0]), golden.SIGMA["xp"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(beam.sigma_y[0]), golden.SIGMA["y"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(beam.sigma_s[0]), golden.SIGMA["s"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(beam.sigma_p[0]), golden.SIGMA["p"], rtol=1e-3
    )


def test_parameter_beam_golden_moments(astra_beam_path):
    beam = lt.ParameterBeam.from_astra(astra_beam_path, dtype=jnp.float64)
    np.testing.assert_allclose(float(beam.energy[0]), golden.ENERGY_EV, rtol=1e-9)
    np.testing.assert_allclose(
        float(beam.total_charge[0]), golden.TOTAL_CHARGE_C, rtol=1e-9
    )
    np.testing.assert_allclose(float(beam.sigma_x[0]), golden.SIGMA["x"], rtol=1e-3)
    np.testing.assert_allclose(float(beam.sigma_p[0]), golden.SIGMA["p"], rtol=1e-3)


def test_beam_types_agree_on_import(astra_beam_path):
    particle = lt.ParticleBeam.from_astra(astra_beam_path)
    parameter = lt.ParameterBeam.from_astra(astra_beam_path)
    for stat in ("mu_x", "sigma_x", "mu_y", "sigma_y", "sigma_s", "sigma_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(particle, stat)),
            np.asarray(getattr(parameter, stat)),
            rtol=1e-2,
            atol=1e-8,
            err_msg=stat,
        )
