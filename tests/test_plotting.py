"""Plotting API smoke tests (reference surface: ``segment.py:371-533``)."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import pytest  # noqa: E402

import lynx_tpu as lt  # noqa: E402


@pytest.fixture
def segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5]), name="d1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
            lt.Dipole(length=jnp.array([0.3]), angle=jnp.array([0.1]), name="b1"),
            lt.HorizontalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([1e-4]), name="h1"
            ),
            lt.Cavity(length=jnp.array([0.5]), name="c1"),
            lt.BPM(name="bpm1"),
            lt.Screen(name="s1"),
            lt.Solenoid(length=jnp.array([0.2]), name="sol1"),
            lt.Undulator(length=jnp.array([0.3]), name="u1"),
            lt.VerticalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([1e-4]), name="v1"
            ),
            lt.Aperture(name="a1"),
            lt.Marker(name="m1"),
        ],
        name="plotme",
    )


def test_segment_plot(segment):
    fig, ax = plt.subplots()
    segment.plot(ax, 0)
    plt.close(fig)


def test_plot_reference_particle_traces(segment):
    fig, (axx, axy) = plt.subplots(2)
    segment.plot_reference_particle_traces(axx, axy, num_particles=5, resolution=0.1)
    plt.close(fig)


def test_plot_overview(segment):
    segment.plot_overview(n=3, resolution=0.1)
    plt.close("all")


def test_plot_twiss(segment):
    beam = lt.ParameterBeam.from_twiss(
        beta_x=jnp.array([5.0]),
        alpha_x=jnp.array([0.0]),
        emittance_x=jnp.array([3.5e-9]),
        beta_y=jnp.array([5.0]),
        alpha_y=jnp.array([0.0]),
        emittance_y=jnp.array([3.5e-9]),
        energy=jnp.array([1e8]),
    )
    segment.plot_twiss(beam)
    plt.close("all")
    segment.plot_twiss_over_lattice(beam)
    plt.close("all")
