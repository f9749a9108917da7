"""ParameterBeam vs ParticleBeam consistency — the always-available internal
oracle (SURVEY.md §4 category 2; tolerances follow the reference's
``tests/test_compare_beam_type.py``: rtol 1e-2, atol 1e-6 on moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt

PARAMS = dict(
    mu_x=jnp.array([1e-5]),
    mu_xp=jnp.array([1e-7]),
    mu_y=jnp.array([-2e-5]),
    mu_yp=jnp.array([-1e-7]),
    sigma_x=jnp.array([1.75e-4]),
    sigma_xp=jnp.array([2e-5]),
    sigma_y=jnp.array([1.75e-4]),
    sigma_yp=jnp.array([2e-5]),
    sigma_s=jnp.array([8e-6]),
    sigma_p=jnp.array([2e-3]),
    energy=jnp.array([1e8]),
)


def _both_beams():
    parameter = lt.ParameterBeam.from_parameters(**PARAMS)
    particle = lt.ParticleBeam.from_parameters(num_particles=300_000, **PARAMS)
    return parameter, particle


def _assert_consistent(out_param, out_particle):
    for stat in ("mu_x", "mu_y", "sigma_x", "sigma_y", "sigma_s", "sigma_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_param, stat)),
            np.asarray(getattr(out_particle, stat)),
            rtol=1e-2,
            atol=1e-6,
            err_msg=stat,
        )
    np.testing.assert_allclose(
        np.asarray(out_param.energy), np.asarray(out_particle.energy)
    )


def test_beams_consistent_at_creation():
    parameter, particle = _both_beams()
    _assert_consistent(parameter, particle)


@pytest.mark.parametrize(
    "element",
    [
        lt.Drift(length=jnp.array([1.3])),
        lt.Quadrupole(length=jnp.array([0.23]), k1=jnp.array([4.2])),
        lt.Dipole(length=jnp.array([0.31]), angle=jnp.array([0.12])),
        lt.Solenoid(length=jnp.array([0.4]), k=jnp.array([1.1])),
        lt.Cavity(
            length=jnp.array([1.0377]),
            voltage=jnp.array([0.01815975e9]),
            frequency=jnp.array([1.3e9]),
            phase=jnp.array([0.0]),
        ),
    ],
    ids=["drift", "quadrupole", "dipole", "solenoid", "cavity"],
)
def test_beams_consistent_through_element(element):
    parameter, particle = _both_beams()
    _assert_consistent(element.track(parameter), element.track(particle))


def test_beams_consistent_through_segment():
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5])),
            lt.Quadrupole(length=jnp.array([0.23]), k1=jnp.array([4.2])),
            lt.Drift(length=jnp.array([0.5])),
            lt.HorizontalCorrector(length=jnp.array([0.1]), angle=jnp.array([1e-4])),
            lt.Drift(length=jnp.array([0.5])),
        ]
    )
    parameter, particle = _both_beams()
    _assert_consistent(segment.track(parameter), segment.track(particle))


def test_from_twiss_consistent():
    kwargs = dict(
        beta_x=jnp.array([5.91]),
        alpha_x=jnp.array([3.55]),
        emittance_x=jnp.array([3.494e-09]),
        beta_y=jnp.array([5.91]),
        alpha_y=jnp.array([3.55]),
        emittance_y=jnp.array([3.497e-09]),
        energy=jnp.array([6e6]),
    )
    parameter = lt.ParameterBeam.from_twiss(**kwargs)
    particle = lt.ParticleBeam.from_twiss(num_particles=300_000, **kwargs)
    np.testing.assert_allclose(
        float(parameter.beta_x[0]), float(particle.beta_x[0]), rtol=2e-2
    )
    np.testing.assert_allclose(
        float(parameter.alpha_x[0]), float(particle.alpha_x[0]), rtol=2e-2
    )
    np.testing.assert_allclose(float(parameter.beta_x[0]), 5.91, rtol=1e-5)
    np.testing.assert_allclose(float(parameter.alpha_x[0]), 3.55, rtol=1e-5)


_CAVITY = dict(
    length=jnp.array([1.0377]),
    voltage=jnp.array([0.01815975e9]),
    frequency=jnp.array([1.3e9]),
    phase=jnp.array([0.0]),
)

_FULL_STATS = (
    ("beta_x", 1e-2, 0.0),
    ("alpha_x", 1e-2, 1e-6),
    ("beta_y", 1e-2, 0.0),
    ("alpha_y", 1e-2, 1e-6),
    # Sampled emittance carries ~1/sqrt(N) statistics noise (1e-3 at the
    # 1e6-particle twiss beam).  The reference asserted jnp.isclose with
    # the DEFAULT atol=1e-8 — which is 3x the emittance itself, i.e.
    # vacuous; rtol 3e-3 (~3 sigma) is the honest version of that check.
    ("emittance_x", 3e-3, 0.0),
    ("emittance_y", 3e-3, 0.0),
    ("mu_x", 1e-2, 1e-6),
    ("mu_y", 1e-2, 1e-6),
    ("mu_xp", 1e-2, 1e-6),
    ("mu_yp", 1e-2, 1e-6),
    ("sigma_x", 1e-2, 1e-6),
    ("sigma_y", 1e-2, 1e-6),
    ("sigma_xp", 1e-2, 1e-6),
    ("sigma_yp", 1e-2, 1e-6),
)


def _assert_full_consistency(out_param, out_particle):
    for stat, rtol, atol in _FULL_STATS:
        np.testing.assert_allclose(
            np.asarray(getattr(out_param, stat)),
            np.asarray(getattr(out_particle, stat)),
            rtol=rtol,
            atol=atol,
            err_msg=stat,
        )
    np.testing.assert_allclose(
        np.asarray(out_param.energy), np.asarray(out_particle.energy)
    )


def test_cavity_from_astra(astra_beam_path):
    """Reference ``test_compare_beam_type.py:142-212``: both beam types
    built from the ACHIP ASTRA fixture (nonzero mu_s, correlated cov) must
    agree after the ARES cavity — the emittance/twiss-level cross-check of
    the nonlinear cavity path."""
    cavity = lt.Cavity(**_CAVITY)
    out_param = cavity.track(lt.ParameterBeam.from_astra(astra_beam_path))
    out_particle = cavity.track(lt.ParticleBeam.from_astra(astra_beam_path))
    _assert_full_consistency(out_param, out_particle)


def test_cavity_from_twiss():
    """Reference ``test_compare_beam_type.py:215-293``: both beam types
    built from the same twiss parameters must agree after the cavity."""
    kwargs = dict(
        beta_x=jnp.array([5.91253677]),
        alpha_x=jnp.array([3.55631308]),
        beta_y=jnp.array([5.91253677]),
        alpha_y=jnp.array([3.55631308]),
        emittance_x=jnp.array([3.494768647122823e-09]),
        emittance_y=jnp.array([3.497810737006068e-09]),
        energy=jnp.array([6e6]),
    )
    cavity = lt.Cavity(**_CAVITY)
    out_param = cavity.track(lt.ParameterBeam.from_twiss(**kwargs))
    out_particle = cavity.track(
        lt.ParticleBeam.from_twiss(
            num_particles=1_000_000, key=jax.random.PRNGKey(42), **kwargs
        )
    )
    _assert_full_consistency(out_param, out_particle)
