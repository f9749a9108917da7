"""Equality, RNG, and repr smoke tests (reference has these skipped/broken)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu import random as lynx_random


def test_element_equality_by_defining_features():
    a = lt.Quadrupole(jnp.array([0.2]), k1=jnp.array([4.2]), name="x")
    b = lt.Quadrupole(jnp.array([0.2]), k1=jnp.array([4.2]), name="y")
    c = lt.Quadrupole(jnp.array([0.2]), k1=jnp.array([-4.2]), name="x")
    assert a == b  # names are not defining features
    assert a != c
    assert a != lt.Drift(jnp.array([0.2]))


def test_seed_reproducibility():
    lynx_random.seed(123)
    beam1 = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([1e-4])
    )
    lynx_random.seed(123)
    beam2 = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([1e-4])
    )
    np.testing.assert_array_equal(
        np.asarray(beam1.particles), np.asarray(beam2.particles)
    )
    beam3 = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([1e-4])
    )
    assert not np.array_equal(
        np.asarray(beam2.particles), np.asarray(beam3.particles)
    )


def test_explicit_key_overrides_global():
    import jax

    beam1 = lt.ParticleBeam.from_parameters(
        num_particles=50, sigma_x=jnp.array([1e-4]), key=jax.random.PRNGKey(7)
    )
    beam2 = lt.ParticleBeam.from_parameters(
        num_particles=50, sigma_x=jnp.array([1e-4]), key=jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(
        np.asarray(beam1.particles), np.asarray(beam2.particles)
    )


def test_reprs_do_not_crash():
    elements = [
        lt.Drift(jnp.array([0.5])),
        lt.Quadrupole(jnp.array([0.2])),
        lt.Dipole(jnp.array([0.3])),
        lt.Cavity(jnp.array([1.0])),
        lt.Screen(),
        lt.BPM(),
        lt.Marker(),
        lt.Aperture(),
        lt.Solenoid(jnp.array([0.2])),
        lt.Undulator(jnp.array([0.3])),
        lt.HorizontalCorrector(jnp.array([0.1])),
        lt.VerticalCorrector(jnp.array([0.1])),
    ]
    segment = lt.Segment(elements)
    assert repr(segment)
    for element in elements:
        assert repr(element)
    beam = lt.ParticleBeam.from_parameters(num_particles=10)
    assert repr(beam)
    assert repr(lt.ParameterBeam.from_parameters())


def test_segment_duplicate_names_return_list():
    segment = lt.Segment(
        [lt.Drift(jnp.array([0.1]), name="d"), lt.Drift(jnp.array([0.2]), name="d")]
    )
    matches = segment.d
    assert isinstance(matches, list) and len(matches) == 2


def test_beam_parameters_dict():
    beam = lt.ParameterBeam.from_parameters(sigma_x=jnp.array([1e-4]))
    params = beam.parameters
    assert set(params) >= {
        "mu_x", "mu_xp", "mu_y", "mu_yp", "sigma_x", "sigma_xp",
        "sigma_y", "sigma_yp", "sigma_s", "sigma_p", "energy",
    }


def test_fodo_lattice_model():
    """The bundled FODO factory reproduces the reference benchmark's
    1058-element lattice and tracks/merges correctly."""
    import jax.numpy as jnp

    import lynx_tpu as lt
    from lynx_tpu.models import fodo_cell, fodo_lattice

    lattice = fodo_lattice()
    assert len(lattice.elements) == 1058
    small = fodo_lattice(num_cells=3, with_steerers=False)
    assert len(small.elements) == 21
    assert isinstance(fodo_cell(), lt.Segment)

    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), energy=jnp.array([1e8])
    )
    out = small.track(beam)
    merged = small.transfer_maps_merged(incoming_beam=beam)
    out_m = merged.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_m.sigma_x), np.asarray(out.sigma_x), rtol=1e-6
    )


@pytest.mark.slow
def test_particle_fidelity_sweep_example_runs():
    """examples/particle_fidelity_sweep.py end to end at tiny sizes."""
    import pathlib
    import sys

    sys.path.insert(
        0, str(pathlib.Path(__file__).parent.parent / "examples")
    )
    import particle_fidelity_sweep

    particle_fidelity_sweep.main(B=4, N=500)
