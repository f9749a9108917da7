"""Ocelot converter tests using the duck-typed shim
(mirrors reference ``tests/test_ocelot_import.py`` element-mapping checks)."""

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt
from lynx_tpu.converters import ocelot_shim as shim


def test_element_type_mapping():
    cell = [
        shim.Drift(l=0.5, eid="d"),
        shim.Quadrupole(l=0.2, k1=4.2, eid="q"),
        shim.Solenoid(l=0.3, k=1.0, eid="sol"),
        shim.Hcor(l=0.1, angle=1e-4, eid="hc"),
        shim.Vcor(l=0.1, angle=1e-4, eid="vc"),
        shim.SBend(l=0.3, angle=0.1, eid="sb"),
        shim.RBend(l=0.3, angle=0.1, eid="rb"),
        shim.Cavity(l=1.0, v=0.018, freq=1.3e9, phi=0.0, eid="cav"),
        shim.TDCavity(l=1.0, v=0.018, freq=2.9e9, phi=90.0, eid="tdc"),
        shim.Monitor(eid="ARBSCX1BSC"),
        shim.Monitor(eid="MYBPM1"),
        shim.Monitor(eid="plain_monitor"),
        shim.Marker(eid="mark"),
        shim.Undulator(l=0.5, eid="und"),
        shim.Aperture(xmax=1e-3, ymax=2e-3, type="elip", eid="ap"),
    ]
    segment = lt.Segment.from_ocelot(cell, warnings=False)
    types = [type(el) for el in segment.elements]
    assert types == [
        lt.Drift,
        lt.Quadrupole,
        lt.Solenoid,
        lt.HorizontalCorrector,
        lt.VerticalCorrector,
        lt.Dipole,
        lt.RBend,
        lt.Cavity,
        lt.Cavity,
        lt.Screen,
        lt.BPM,
        lt.Marker,
        lt.Marker,
        lt.Undulator,
        lt.Aperture,
    ]


def test_quadrupole_parameters_carried():
    segment = lt.Segment.from_ocelot(
        [shim.Quadrupole(l=0.122, k1=-3.1, eid="q")], warnings=False
    )
    q = segment.q
    np.testing.assert_allclose(float(q.length[0]), 0.122)
    np.testing.assert_allclose(float(q.k1[0]), -3.1)


def test_cavity_voltage_gv_to_v():
    segment = lt.Segment.from_ocelot(
        [shim.Cavity(l=1.0377, v=0.01815975, freq=1.3e9, phi=0.0, eid="c")],
        warnings=False,
    )
    np.testing.assert_allclose(float(segment.c.voltage[0]), 0.01815975e9)


def test_rbend_edge_roundtrip():
    """Ocelot pre-adds angle/2 to RBend edges; converter subtracts, RBend
    re-adds — roundtrip is identity (reference ``converters/ocelot.py:104-105``)."""
    ocelot_rbend = shim.RBend(l=0.5, angle=0.2, e1=0.1, e2=0.1, eid="rb")
    segment = lt.Segment.from_ocelot([ocelot_rbend], warnings=False)
    np.testing.assert_allclose(float(segment.rb.e1[0]), 0.1, atol=1e-7)
    np.testing.assert_allclose(float(segment.rb.e2[0]), 0.1, atol=1e-7)


def test_aperture_shape_translation():
    segment = lt.Segment.from_ocelot(
        [shim.Aperture(xmax=1e-3, ymax=2e-3, type="elip", eid="ap")],
        warnings=False,
    )
    assert segment.ap.shape == "elliptical"
    assert segment.ap.is_active


def test_unknown_element_becomes_drift():
    class Sextupole(shim.OcelotElementShim):
        pass

    segment = lt.Segment.from_ocelot(
        [Sextupole(l=0.15, eid="sext")], warnings=False
    )
    assert isinstance(segment.sext, lt.Drift)
    np.testing.assert_allclose(float(segment.sext.length[0]), 0.15)


def test_subcell_of_ocelot():
    from lynx_tpu.converters.ocelot import subcell_of_ocelot

    cell = [
        shim.Drift(l=0.1, eid="a"),
        shim.Drift(l=0.2, eid="b"),
        shim.Drift(l=0.3, eid="c"),
        shim.Drift(l=0.4, eid="d"),
    ]
    sub = subcell_of_ocelot(cell, "b", "c")
    assert [el.id for el in sub] == ["b", "c"]
