"""Bmad lattice conversion (mirrors reference ``tests/test_bmad_conversion.py``)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt

RESOURCES = Path(__file__).parent / "resources"


def test_bmad_tutorial():
    """Import the lattice example from the Bmad & Tao tutorial."""
    converted = lt.Segment.from_bmad(str(RESOURCES / "bmad_tutorial_lattice.bmad"))
    converted.name = "bmad_tutorial"

    assert [el.name for el in converted.elements] == ["d", "b", "q"]
    assert isinstance(converted.d, lt.Drift)
    assert isinstance(converted.b, lt.Dipole)
    assert isinstance(converted.q, lt.Quadrupole)
    np.testing.assert_allclose(float(converted.d.length[0]), 0.5)
    np.testing.assert_allclose(float(converted.b.length[0]), 0.5)
    np.testing.assert_allclose(float(converted.b.e1[0]), 0.1)
    np.testing.assert_allclose(float(converted.q.length[0]), 0.6)
    np.testing.assert_allclose(float(converted.q.k1[0]), 0.23)


def test_bmad_expression_evaluation(tmp_path):
    lattice = tmp_path / "expr.bmad"
    lattice.write_text(
        "myvar = 2 * pi\n"
        "q: quadrupole, L = 0.5, k1 = myvar / 4\n"
        "lat: line = (q)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    np.testing.assert_allclose(
        float(converted.q.k1[0]), 2 * np.pi / 4, rtol=1e-6
    )


def test_bmad_call_file_inclusion(tmp_path):
    include = tmp_path / "sub.bmad"
    include.write_text("d1: drift, L = 0.25\n")
    main = tmp_path / "main.bmad"
    main.write_text(
        f"call, file = {include}\n"
        "d2: drift, L = 0.75\n"
        "lat: line = (d1, d2)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(main))
    np.testing.assert_allclose(float(converted.length.ravel()[0]), 1.0)


def test_bmad_line_continuation(tmp_path):
    lattice = tmp_path / "cont.bmad"
    lattice.write_text(
        "d1: drift, &\nL = 0.5\n"
        "lat: line = (d1)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    np.testing.assert_allclose(float(converted.d1.length[0]), 0.5)


def test_bmad_lcavity_phase_convention(tmp_path):
    """Bmad phi0 (turns) -> lynx phase (degrees, negated)."""
    lattice = tmp_path / "cav.bmad"
    lattice.write_text(
        "c: lcavity, rf_frequency = 1.3e9, l = 1.0377, voltage = 0.01815975e9,"
        " phi0 = 0.25\n"
        "lat: line = (c)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    np.testing.assert_allclose(float(converted.c.phase[0]), -90.0, rtol=1e-6)
    np.testing.assert_allclose(float(converted.c.voltage[0]), 0.01815975e9)


def test_bmad_wildcard_property_assignment(tmp_path):
    lattice = tmp_path / "wild.bmad"
    lattice.write_text(
        "q1: quadrupole, L = 0.5, k1 = 1.0\n"
        "q2: quadrupole, L = 0.5, k1 = 2.0\n"
        "quadrupole::q*[k1] = 7.0\n"
        "lat: line = (q1, q2)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    np.testing.assert_allclose(float(converted.q1.k1[0]), 7.0)
    np.testing.assert_allclose(float(converted.q2.k1[0]), 7.0)


def test_bmad_element_subclassing(tmp_path):
    """An element defined from another element inherits its properties."""
    lattice = tmp_path / "sub.bmad"
    lattice.write_text(
        "base_quad: quadrupole, L = 0.5, k1 = 3.0\n"
        "q1: base_quad\n"
        "lat: line = (q1)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    np.testing.assert_allclose(float(converted.q1.k1[0]), 3.0)


def test_bmad_overlay_definition_parses(tmp_path):
    """Overlay definitions (both expression- and knot-based) must parse and
    be recorded without derailing conversion (reference ``bmad.py:302-345``
    likewise records overlays in the context)."""
    lattice = tmp_path / "overlay.bmad"
    lattice.write_text(
        "q1: quadrupole, L = 0.5, k1 = 1.0\n"
        "d1: drift, L = 0.3\n"
        "ov1: overlay = {q1[k1]: 2 * ramp}, var = {ramp}\n"
        "ov2: overlay = {d1[L]}, var = {s_pos}, x_knot = {0.0, 1.0}\n"
        "lat: line = (q1, d1)\n"
        "use, lat\n"
    )
    converted = lt.Segment.from_bmad(str(lattice))
    assert converted.q1.k1.shape == (1,)
    np.testing.assert_allclose(float(converted.d1.length[0]), 0.3)
