"""Debug utilities tests."""

import jax.numpy as jnp
import pytest

import lynx_tpu as lt
from lynx_tpu.debug import nan_debug, validate_beam


def test_validate_beam_passes_on_healthy_beams():
    validate_beam(lt.ParameterBeam.from_parameters(sigma_x=jnp.array([1e-4])))
    validate_beam(
        lt.ParticleBeam.from_parameters(num_particles=100, sigma_x=jnp.array([1e-4]))
    )
    validate_beam(lt.Beam.empty)


def test_validate_beam_catches_nan():
    beam = lt.ParameterBeam.from_parameters(sigma_x=jnp.array([1e-4]))
    beam._mu = beam._mu.at[..., 0].set(jnp.nan)
    with pytest.raises(ValueError, match="non-finite mu"):
        validate_beam(beam)


def test_validate_beam_catches_bad_survival():
    beam = lt.ParticleBeam.from_parameters(
        num_particles=10, sigma_x=jnp.array([1e-4])
    )
    beam.survival = jnp.full((1, 10), 2.0)
    with pytest.raises(ValueError, match="survival"):
        validate_beam(beam)


def test_nan_debug_context_restores_flag():
    import jax

    before = jax.config.jax_debug_nans
    with nan_debug():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before
