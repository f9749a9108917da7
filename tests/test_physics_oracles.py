"""Closed-form physics oracles for element maps beyond base_rmatrix
(supplements ``test_rmatrix.py``; SURVEY.md §4 category 1)."""

import math

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt


def test_dipole_edge_map_formula():
    """Entrance/exit wedge: R21 = hx tan(e); R43 = -hx tan(e - psi) with
    psi = fint * hx * gap * sec(e) * (1 + sin^2 e)
    (reference ``dipole.py:143-181``)."""
    length, angle, e1, fint, gap = 0.31, 0.12, 0.07, 0.45, 0.05
    dipole = lt.Dipole(
        length=jnp.array([length], dtype=jnp.float64),
        angle=jnp.array([angle], dtype=jnp.float64),
        e1=jnp.array([e1], dtype=jnp.float64),
        fringe_integral=jnp.array([fint], dtype=jnp.float64),
        gap=jnp.array([gap], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    hx = angle / length
    sec_e = 1.0 / math.cos(e1)
    psi = fint * hx * gap * sec_e * (1 + math.sin(e1) ** 2)

    R_enter = dipole._edge_map(dipole.e1, dipole.fringe_integral)
    np.testing.assert_allclose(float(R_enter[0, 1, 0]), hx * math.tan(e1), rtol=1e-12)
    np.testing.assert_allclose(
        float(R_enter[0, 3, 2]), -hx * math.tan(e1 - psi), rtol=1e-12
    )


def test_solenoid_map_formula():
    """Chao solenoid block entries (reference ``solenoid.py:61-105``)."""
    length, k, energy = 0.4, 1.7, 1.3e8
    solenoid = lt.Solenoid(
        length=jnp.array([length], dtype=jnp.float64),
        k=jnp.array([k], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    R = solenoid.transfer_map(jnp.array([energy], dtype=jnp.float64))
    c = math.cos(length * k)
    s = math.sin(length * k)
    np.testing.assert_allclose(float(R[0, 0, 0]), c * c, rtol=1e-12)
    np.testing.assert_allclose(float(R[0, 0, 1]), c * s / k, rtol=1e-12)
    np.testing.assert_allclose(float(R[0, 1, 2]), -k * s * s, rtol=1e-12)
    np.testing.assert_allclose(float(R[0, 3, 0]), k * s * s, rtol=1e-12)
    # Symplectic 4x4 transverse block: det == 1.
    det = np.linalg.det(np.asarray(R[0, :4, :4]))
    np.testing.assert_allclose(det, 1.0, rtol=1e-10)


def test_quadrupole_map_is_symplectic():
    """The 4x4 transverse block of any quad map has determinant 1."""
    for k1 in (-8.0, -0.5, 0.0, 0.5, 8.0):
        quad = lt.Quadrupole(
            length=jnp.array([0.23], dtype=jnp.float64),
            k1=jnp.array([k1], dtype=jnp.float64),
            tilt=jnp.array([0.3], dtype=jnp.float64),
            dtype=jnp.float64,
        )
        R = quad.transfer_map(jnp.array([1e8], dtype=jnp.float64))
        det = np.linalg.det(np.asarray(R[0, :4, :4]))
        np.testing.assert_allclose(det, 1.0, rtol=1e-10)


def test_sector_bend_closes_on_itself():
    """Tracking a full 2*pi sector bend returns transverse coordinates to the
    start (the map over one turn of the reference circle is identity in x)."""
    n_slices = 64
    angle = 2 * math.pi / n_slices
    length = 0.5
    bend = lt.Dipole(
        length=jnp.array([length], dtype=jnp.float64),
        angle=jnp.array([angle], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    energy = jnp.array([1e9], dtype=jnp.float64)
    R = bend.transfer_map(energy)[0]
    total = np.eye(7)
    for _ in range(n_slices):
        total = np.asarray(R) @ total
    # x-x' block returns to identity after a full turn.
    np.testing.assert_allclose(total[:2, :2], np.eye(2), atol=1e-6)


def test_drift_composition_associativity():
    """Two half drifts equal one full drift exactly in exact arithmetic."""
    energy = jnp.array([1e8], dtype=jnp.float64)
    full = lt.Drift(jnp.array([1.0], dtype=jnp.float64), dtype=jnp.float64)
    half = lt.Drift(jnp.array([0.5], dtype=jnp.float64), dtype=jnp.float64)
    R_full = np.asarray(full.transfer_map(energy)[0])
    R_half = np.asarray(half.transfer_map(energy)[0])
    np.testing.assert_allclose(R_half @ R_half, R_full, rtol=1e-14)


def test_f32_tracking_matches_f64_ares_ea():
    """Single-precision tracking through the full ARES EA must stay within
    f32 conditioning of the f64 result — guards the cancellation-free
    reparametrizations (cavity alpha/r56, drift gamma guards) against
    regressions that only show up in f32."""
    import jax.numpy as jnp

    import lynx_tpu as lt
    from lynx_tpu.functional import track
    from lynx_tpu.models import ares_ea_segment

    import jax

    def with_dtype(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: (
                x.astype(dtype)
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating)
                else x
            ),
            tree,
        )

    outs = {}
    for dtype in (jnp.float32, jnp.float64):
        segment = with_dtype(ares_ea_segment(), dtype)
        segment.AREABSCR1.is_active = False
        segment.AREAMQZM1.k1 = jnp.array([4.2], dtype=dtype)
        segment.AREAMQZM2.k1 = jnp.array([-4.2], dtype=dtype)
        beam = lt.ParameterBeam.from_parameters(
            sigma_x=jnp.array([1.75e-4], dtype=dtype),
            sigma_y=jnp.array([1.75e-4], dtype=dtype),
            sigma_p=jnp.array([2e-3], dtype=dtype),
            energy=jnp.array([1.073e8], dtype=dtype),
            dtype=dtype,
        )
        outs[dtype], _ = track(segment, beam)

    for stat in ("mu_x", "mu_y", "sigma_x", "sigma_y", "sigma_s", "sigma_p"):
        a = np.asarray(getattr(outs[jnp.float32], stat), dtype=np.float64)
        b = np.asarray(getattr(outs[jnp.float64], stat))
        np.testing.assert_allclose(a, b, rtol=2e-4, err_msg=stat)
