"""ARES lattice model tests (the reference's flagship lattice)."""

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt
from lynx_tpu.models import ares_ea_segment, ares_lattice


def test_full_lattice_loads():
    lattice = ares_lattice()
    assert len(lattice.elements) == 195
    np.testing.assert_allclose(float(lattice.length.ravel()[0]), 42.3495, rtol=1e-4)


def test_ea_segment_structure():
    ea = ares_ea_segment()
    names = [el.name for el in ea.elements]
    assert names[0] == "AREASOLA1"
    assert names[-1] == "AREABSCR1"
    assert isinstance(ea.AREAMQZM1, lt.Quadrupole)
    assert isinstance(ea.AREAMQZM2, lt.Quadrupole)
    assert isinstance(ea.AREAMQZM3, lt.Quadrupole)
    assert isinstance(ea.AREAMCVM1, lt.VerticalCorrector)
    assert isinstance(ea.AREAMCHM1, lt.HorizontalCorrector)
    assert isinstance(ea.AREABSCR1, lt.Screen)


def test_ea_track_with_active_screen(astra_beam_path):
    ea = ares_ea_segment()
    ea.AREABSCR1.is_active = True
    ea.AREAMQZM1.k1 = jnp.array([4.2])
    ea.AREAMQZM2.k1 = jnp.array([-4.2])
    beam = lt.ParticleBeam.from_astra(astra_beam_path)
    outgoing = ea.track(beam)
    assert outgoing is lt.Beam.empty  # screen absorbs
    reading = ea.AREABSCR1.reading
    assert reading.shape == (1, 2040, 2448)
    assert float(reading.sum()) > 0


def test_ea_quadrupole_focuses(astra_beam_path):
    ea = ares_ea_segment()
    beam = lt.ParticleBeam.from_astra(astra_beam_path)
    out_off = ea.track(beam)
    ea.AREAMQZM1.k1 = jnp.array([25.0])
    ea.AREAMQZM2.k1 = jnp.array([-25.0])
    out_on = ea.track(beam)
    assert not np.isclose(
        float(out_on.sigma_x[0]), float(out_off.sigma_x[0]), rtol=1e-3
    )


def test_ea_screens_detected():
    lattice = ares_lattice()
    screens = [el.name for el in lattice.elements if isinstance(el, lt.Screen)]
    assert "AREABSCR1" in screens
    assert len(screens) >= 13
