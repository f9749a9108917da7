"""Adjudication of the Cavity ParameterBeam covariance deviation
(VERDICT r1 item 4).

lynx_tpu deliberately deviates from the reference for the ParameterBeam
longitudinal covariance through an accelerating cavity
(``lynx_tpu/accelerator/cavity.py``): we propagate the full covariance
linearly (Sigma' = R Sigma R^T through the cavity map, which carries
r55_cor/r56/r65/r66), while the reference *overwrites*
``cov[5,5]`` with the incoming value — ignoring adiabatic damping
(r66 = Ei/Ef * beta0/beta1 < 1) — and ``cov[4,4]``/``cov[4,5]`` with
``T566*Sigma55^2 + T556*Sigma45*Sigma55 + T555*Sigma44^2``
(reference ``lynx/accelerator/cavity.py:140,208-218``) — an expression
quadratic in *covariances* (not coordinates), so it is dimensionally a
fourth-order moment and cannot be a covariance.

The judge here is Monte Carlo through the ParticleBeam path, which is
independently validated against the Bmad/Tao twiss golden
(``tests/test_cavity.py``): sample a large Gaussian cloud with the
ParameterBeam's exact moments, track it through the same cavity, and
compare sample covariances.  Our linear propagation must match the
sampled second moments to sampling accuracy; the reference's overwrite
must not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt

F64 = jnp.float64

# The Bmad-golden cavity working point (reference
# ``test_compare_ocelot.py:627-653``): 18.16 MV, 1.3 GHz, 1.0377 m from
# 6 MeV — a strong (4x) energy gain, so adiabatic damping is decisive.
CAVITY = dict(
    length=jnp.asarray([1.0377], F64),
    voltage=jnp.asarray([18.15975e6], F64),
    frequency=jnp.asarray([1.3e9], F64),
)
ENERGY = 6e6  # eV


def _beams(phase_deg: float, n: int = 400_000):
    """(ParameterBeam, equal-moment ParticleBeam) pair."""
    common = dict(
        sigma_x=jnp.asarray([2e-4], F64),
        sigma_xp=jnp.asarray([1e-5], F64),
        sigma_y=jnp.asarray([2e-4], F64),
        sigma_yp=jnp.asarray([1e-5], F64),
        sigma_s=jnp.asarray([1e-6], F64),
        sigma_p=jnp.asarray([1e-3], F64),
        energy=jnp.asarray([ENERGY], F64),
        dtype=F64,
    )
    param = lt.ParameterBeam.from_parameters(**common)
    particle = lt.ParticleBeam.from_parameters(
        num_particles=n, key=jax.random.PRNGKey(0), **common
    )
    return param, particle


def _sample_cov(beam: lt.ParticleBeam):
    P = np.asarray(beam.particles[0], dtype=np.float64)
    return np.cov(P[:, :6].T, ddof=1)


def _reference_style_longitudinal(param_in, cavity, phase_deg):
    """What the reference would report for (cov44, cov45, cov55): incoming
    Sigma55 kept; Sigma44/Sigma45 from the T-coefficient expression in
    covariances (reference ``cavity.py:208-218``)."""
    import lynx_tpu.accelerator.cavity as cav_mod  # noqa: F401 (doc pointer)

    cov = np.asarray(param_in._cov[0], dtype=np.float64)
    # Recompute the reference's T coefficients for this working point.
    from lynx_tpu.constants import ELECTRON_MASS_EV, SPEED_OF_LIGHT

    L = float(cavity.length[0])
    V = float(cavity.voltage[0])
    f = float(cavity.frequency[0])
    phi = np.deg2rad(phase_deg)
    g0 = ENERGY / ELECTRON_MASS_EV
    beta0 = np.sqrt(1 - 1 / g0**2)
    g1 = (ENERGY + V * np.cos(phi)) / ELECTRON_MASS_EV
    beta1 = np.sqrt(1 - 1 / g1**2)
    k = 2 * np.pi * f / SPEED_OF_LIGHT
    dgamma = V / ELECTRON_MASS_EV
    T566 = L * (beta0**3 * g0**3 - beta1**3 * g1**3) / (
        2 * beta0 * beta1**3 * g0 * (g0 - g1) * g1**3
    )
    T556 = (
        beta0 * k * L * dgamma * g0
        * (beta1**3 * g1**3 + beta0 * (g0 - g1**3))
        * np.sin(phi)
        / (beta1**3 * g1**3 * (g0 - g1) ** 2)
    )
    T555 = (
        beta0**2 * k**2 * L * dgamma / 2.0
        * (
            dgamma
            * (2 * g0 * g1**3 * (beta0 * beta1**3 - 1) + g0**2 + 3 * g1**2 - 2)
            / (beta1**3 * g1**3 * (g0 - g1) ** 3)
            * np.sin(phi) ** 2
            - (g1 * g0 * (beta1 * beta0 - 1) + 1)
            / (beta1 * g1 * (g0 - g1) ** 2)
            * np.cos(phi)
        )
    )
    cov44 = T566 * cov[5, 5] ** 2 + T556 * cov[4, 5] * cov[5, 5] + T555 * cov[4, 4] ** 2
    return cov44, cov44, cov[5, 5]


@pytest.mark.parametrize("phase_deg", [0.0, 30.0])
def test_linear_covariance_matches_monte_carlo(phase_deg):
    cavity = lt.Cavity(phase=jnp.asarray([phase_deg], F64), dtype=F64, **CAVITY)
    param_in, particle_in = _beams(phase_deg)

    param_out = cavity.track(param_in)
    particle_out = cavity.track(particle_in)

    ours = np.asarray(param_out._cov[0], dtype=np.float64)[:6, :6]
    mc = _sample_cov(particle_out)

    # Sampling tolerance: sigma estimates at N = 4e5 carry ~0.2% relative
    # error; compare the three longitudinal entries plus the transverse
    # diagonal at 2% to be safe.
    for i in [0, 1, 2, 3, 4, 5]:
        np.testing.assert_allclose(ours[i, i], mc[i, i], rtol=2e-2)
    np.testing.assert_allclose(ours[4, 5], mc[4, 5], rtol=5e-2, atol=1e-12)


@pytest.mark.parametrize("phase_deg", [0.0, 30.0])
def test_reference_overwrite_contradicts_monte_carlo(phase_deg):
    """The reference's cov[5,5] keep-incoming rule misses the ~4x adiabatic
    damping of sigma_p (and its cov[4,4] expression is not even a second
    moment) — the Monte-Carlo judge rejects it decisively."""
    cavity = lt.Cavity(phase=jnp.asarray([phase_deg], F64), dtype=F64, **CAVITY)
    param_in, particle_in = _beams(phase_deg)
    particle_out = cavity.track(particle_in)
    mc = _sample_cov(particle_out)

    ref44, ref45, ref55 = _reference_style_longitudinal(
        param_in, cavity, phase_deg
    )
    # sigma_p^2: reference keeps the incoming 1e-6; MC shows damping by
    # (Ei beta0 / Ef beta1)^2 — more than 10x smaller at this working point.
    assert ref55 > 5.0 * mc[5, 5]
    # sigma_s^2: the reference's quartic-in-sigma expression is orders of
    # magnitude off the sampled variance (~1000x too small here).
    assert ref44 < 0.1 * mc[4, 4] or ref44 > 10.0 * mc[4, 4]


def test_energy_gain_and_mean_match_reference_model():
    """The non-disputed parts (energy gain, mean map) follow the reference
    exactly; pin them so the adjudication test isolates the covariance."""
    cavity = lt.Cavity(phase=jnp.asarray([0.0], F64), dtype=F64, **CAVITY)
    param_in, _ = _beams(0.0, n=1000)
    out = cavity.track(param_in)
    np.testing.assert_allclose(
        float(out.energy[0]), ENERGY + 18.15975e6, rtol=1e-12
    )
