"""Moment-sufficiency fast path: ParticleBeam-exact observations at
ParameterBeam cost.

For a purely linear (affine 7x7) lattice, the survival-weighted sample
moments of a tracked particle cloud obey exactly ``mu' = R mu`` and
``Sigma' = R Sigma R^T`` — the moments are a *sufficient statistic* for any
moment observable, so ``beam.as_parameter_beam()`` tracked through the
lattice yields the same ``mu_*``/``sigma_*`` readings as pushing all N
particles.  This is the algebra behind the >= 1e6 env-steps/s/chip north
star (BASELINE.md:27; reference workload
``/root/reference/docs/examples/gradientbased.ipynb``).

These tests pin the claimed exactness (f64, down to accumulation rounding)
and the routing (``moment_sufficient``, env ``method="auto"``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu.envs import make_env
from lynx_tpu.functional import moment_sufficient, track


def _sampled_beam(key=0, n=2000, dtype=jnp.float64, survival=False):
    beam = lt.ParticleBeam.from_parameters(
        num_particles=n,
        mu_x=jnp.array([3e-5]),
        mu_yp=jnp.array([-1e-5]),
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        sigma_p=jnp.array([2e-3]),
        energy=jnp.array([1.073e8]),
        key=jax.random.PRNGKey(key),
        dtype=dtype,
    )
    if survival:
        weights = (
            jax.random.uniform(jax.random.PRNGKey(key + 1), (1, n)) > 0.25
        ).astype(dtype)
        beam = lt.ParticleBeam(
            beam.particles,
            beam.energy,
            particle_charges=beam.particle_charges,
            survival=weights,
        )
    return beam


STAT_NAMES = [
    "mu_x", "sigma_x", "mu_xp", "sigma_xp",
    "mu_y", "sigma_y", "mu_yp", "sigma_yp",
    "mu_s", "sigma_s", "mu_p", "sigma_p",
]


@pytest.mark.parametrize("survival", [False, True])
def test_as_parameter_beam_matches_sample_stats(survival):
    beam = _sampled_beam(survival=survival)
    moments = beam.as_parameter_beam()
    for name in STAT_NAMES:
        np.testing.assert_allclose(
            np.asarray(getattr(moments, name)),
            np.asarray(getattr(beam, name)),
            rtol=1e-12,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(moments.total_charge), np.asarray(beam.total_charge)
    )
    # The homogeneous 7th coordinate is exactly (mean 1, variance 0).
    assert float(moments._mu[0, 6]) == 1.0
    np.testing.assert_array_equal(np.asarray(moments._cov[0, 6, :]), 0.0)


@pytest.mark.parametrize("survival", [False, True])
def test_moment_path_is_exact_through_linear_lattice(survival):
    """f64: tracked sample moments == tracked moment beam to accumulation
    rounding, through a lattice mixing every linear element family."""
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.2], jnp.float64)),
            lt.Quadrupole(
                length=jnp.array([0.12], jnp.float64),
                k1=jnp.array([6.0], jnp.float64),
                tilt=jnp.array([0.1], jnp.float64),
            ),
            lt.HorizontalCorrector(
                length=jnp.array([0.02], jnp.float64),
                angle=jnp.array([2e-3], jnp.float64),
            ),
            lt.Dipole(
                length=jnp.array([0.3], jnp.float64),
                angle=jnp.array([0.05], jnp.float64),
            ),
            lt.Solenoid(
                length=jnp.array([0.15], jnp.float64),
                k=jnp.array([2.0], jnp.float64),
            ),
            lt.Drift(length=jnp.array([0.5], jnp.float64)),
        ]
    )
    beam = _sampled_beam(survival=survival)
    assert moment_sufficient(segment, beam)

    outgoing_particles, _ = track(segment, beam)
    outgoing_moments, _ = track(segment, beam.as_parameter_beam())
    for name in STAT_NAMES:
        np.testing.assert_allclose(
            np.asarray(getattr(outgoing_moments, name)),
            np.asarray(getattr(outgoing_particles, name)),
            rtol=1e-10,
            atol=1e-18,
            err_msg=name,
        )


@pytest.mark.parametrize("seed", range(5))
def test_moment_path_exactness_fuzz(seed):
    """Randomized linear lattices (f64): the moment route must match the
    dense particle push to accumulation rounding on every draw — the
    algebraic claim, not a single fixture."""
    rng = np.random.default_rng(seed)
    elements = []
    for _ in range(rng.integers(3, 9)):
        kind = rng.integers(0, 6)
        f64 = jnp.float64
        if kind == 0:
            elements.append(
                lt.Drift(jnp.array([rng.uniform(0.05, 1.0)], f64), dtype=f64)
            )
        elif kind == 1:
            elements.append(
                lt.Quadrupole(
                    jnp.array([rng.uniform(0.05, 0.3)], f64),
                    k1=jnp.array([rng.uniform(-20, 20)], f64),
                    tilt=jnp.array([rng.uniform(-0.3, 0.3)], f64),
                    dtype=f64,
                )
            )
        elif kind == 2:
            elements.append(
                lt.Dipole(
                    jnp.array([rng.uniform(0.1, 0.5)], f64),
                    angle=jnp.array([rng.uniform(-0.1, 0.1)], f64),
                    e1=jnp.array([rng.uniform(-0.05, 0.05)], f64),
                    dtype=f64,
                )
            )
        elif kind == 3:
            elements.append(
                lt.Solenoid(
                    jnp.array([rng.uniform(0.1, 0.4)], f64),
                    k=jnp.array([rng.uniform(0.0, 5.0)], f64),
                    dtype=f64,
                )
            )
        elif kind == 4:
            cls = (
                lt.HorizontalCorrector
                if rng.integers(0, 2)
                else lt.VerticalCorrector
            )
            elements.append(
                cls(
                    jnp.array([rng.uniform(0.01, 0.1)], f64),
                    angle=jnp.array([rng.uniform(-3e-3, 3e-3)], f64),
                    dtype=f64,
                )
            )
        else:
            elements.append(lt.Marker())
    segment = lt.Segment(elements)
    beam = _sampled_beam(key=100 + seed, n=1500, survival=bool(seed % 2))
    assert moment_sufficient(segment, beam)

    out_particles, _ = track(segment, beam)
    out_moments, _ = track(segment, beam.as_parameter_beam())
    for name in STAT_NAMES:
        np.testing.assert_allclose(
            np.asarray(getattr(out_moments, name)),
            np.asarray(getattr(out_particles, name)),
            rtol=1e-9,
            atol=1e-17,
            err_msg=f"seed {seed}: {name}",
        )


def test_moment_sufficient_rejects_per_particle_elements():
    beam = _sampled_beam()
    drift = lt.Drift(length=jnp.array([0.2], jnp.float64))
    aperture = lt.Aperture(
        x_max=jnp.array([1e-4]), y_max=jnp.array([1e-4]), is_active=True
    )
    screen = lt.Screen(is_active=True)
    cavity = lt.Cavity(
        length=jnp.array([1.0]),
        voltage=jnp.array([1e6]),
        frequency=jnp.array([1.3e9]),
    )
    assert moment_sufficient(lt.Segment([drift]), beam)
    assert not moment_sufficient(lt.Segment([drift, aperture]), beam)
    assert not moment_sufficient(lt.Segment([drift, screen]), beam)
    assert not moment_sufficient(lt.Segment([drift, cavity]), beam)
    # Inactive variants are skippable again.
    assert moment_sufficient(
        lt.Segment([drift, lt.Screen(is_active=False)]), beam
    )
    # ParameterBeam is already a moment representation: not applicable.
    assert not moment_sufficient(
        lt.Segment([drift]), beam.as_parameter_beam()
    )


@pytest.mark.slow
def test_env_auto_routes_to_moments_and_matches_particles():
    env = make_env()
    beam = _sampled_beam(n=4000)
    magnets = jax.random.uniform(
        jax.random.PRNGKey(7), (5, env.num_actions), minval=-0.5, maxval=0.5
    ).astype(jnp.float64)

    auto = env.batched_particle_beam_parameters(magnets, beam)
    moments = env.batched_particle_beam_parameters(
        magnets, beam, method="moments"
    )
    particles = env.batched_particle_beam_parameters(
        magnets, beam, method="particles"
    )
    # auto == moments (the EA with its screen inactive is moment-sufficient).
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(moments))
    # moments == particles to accumulation rounding (f64).
    np.testing.assert_allclose(
        np.asarray(moments), np.asarray(particles), rtol=1e-9, atol=1e-15
    )


def test_env_moment_route_under_jit_f32():
    env = make_env()
    beam = _sampled_beam(n=4000, dtype=jnp.float32)
    magnets = jax.random.uniform(
        jax.random.PRNGKey(9), (8, env.num_actions), minval=-0.5, maxval=0.5
    )
    fn = jax.jit(
        lambda m: env.batched_particle_beam_parameters(m, beam)
    )
    dense = env.batched_particle_beam_parameters(
        magnets, beam, method="particles"
    )
    np.testing.assert_allclose(
        np.asarray(fn(magnets)), np.asarray(dense), rtol=3e-3, atol=1e-9
    )


@pytest.mark.slow
def test_moment_route_is_differentiable():
    env = make_env()
    beam = _sampled_beam(n=1000, dtype=jnp.float32)
    magnets = jnp.zeros((4, env.num_actions))

    def loss(m):
        out = env.batched_particle_beam_parameters(m, beam)
        return jnp.sum(out[:, 1] ** 2 + out[:, 3] ** 2)

    grads = jax.grad(loss)(magnets)
    assert bool(jnp.all(jnp.isfinite(grads)))
    assert float(jnp.max(jnp.abs(grads))) > 0.0
