"""Independent transfer-map oracle via matrix exponentials of the
infinitesimal generators (the linearized equations of motion).

Cheetah/Ocelot cannot be installed in this environment (no network), so
the external cross-check the reference gets from live Ocelot
(reference ``tests/test_compare_ocelot.py:39-287``) is provided by a
*different derivation path* instead: for every constant-coefficient
element the transfer matrix is ``expm(A L)`` where ``A`` is the
generator of the linear ODE system

    x'   = px
    px'  = -(k1 + hx^2) x + (hx / beta) delta      (+ kick terms)
    y'   = py
    py'  = +k1 y
    tau' = (hx / beta) x - delta / (beta^2 gamma^2)
    delta' = 0

in the trace-space state ``(x, x', y, y', tau, delta, 1)``.  The
closed-form matrices in ``lynx_tpu.ops.rmatrix`` (trig/hyperbolic
branches, dispersion ``dx``, ``r56``) must agree with the numerically
exponentiated generators to ~1e-12 in float64 — a genuine independent
validation of every algebraic branch, not a recomputation of the same
formulas.  Everything here is plain numpy/scipy float64 with no shared
code with the package.

Thin maps (dipole edge wedges, corrector kicks, misalignment shifts)
are hard-edge limits with no ODE; they are built from their defining
published formulas (MAD-8/Bmad edge focusing) in float64.
"""

from __future__ import annotations

import numpy as np
import scipy.constants
from scipy.linalg import expm

# Independent constant derivation (scipy CODATA, not lynx_tpu.constants).
REST_ENERGY_EV = (
    scipy.constants.electron_mass
    * scipy.constants.speed_of_light**2
    / scipy.constants.elementary_charge
)


def relativistic(energy_ev: float):
    """(gamma, beta, igamma2) of an electron with total energy ``energy_ev``."""
    gamma = energy_ev / REST_ENERGY_EV
    if gamma == 0:
        return 0.0, 0.0, 0.0
    igamma2 = 1.0 / gamma**2
    beta = np.sqrt(1.0 - igamma2)
    return gamma, beta, igamma2


def drift_map(length: float, energy: float) -> np.ndarray:
    gamma, beta, igamma2 = relativistic(energy)
    A = np.zeros((7, 7))
    A[0, 1] = 1.0
    A[2, 3] = 1.0
    if gamma != 0:
        A[4, 5] = -igamma2 / beta**2
    return expm(A * length)


def sector_body_map(
    length: float, k1: float, hx: float, energy: float
) -> np.ndarray:
    """Body of a combined-function sector bend (quad when hx == 0).

    NOTE the E == 0 convention of the closed form (``base_rmatrix``):
    igamma2 = 1 (not 0) when no energy is given, hence beta = 0 and the
    longitudinal generator entry diverges — callers must pass E > 0.
    """
    gamma, beta, igamma2 = relativistic(energy)
    assert gamma > 1.0, "oracle requires a physical beam energy"
    A = np.zeros((7, 7))
    A[0, 1] = 1.0
    A[1, 0] = -(k1 + hx**2)
    A[1, 5] = hx / beta
    A[2, 3] = 1.0
    A[3, 2] = k1
    A[4, 0] = hx / beta
    A[4, 5] = -igamma2 / beta**2
    return expm(A * length)


def rotation(angle: float) -> np.ndarray:
    """x-y rotation of the map (skew frame change)."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.eye(7)
    R[0, 0] = R[1, 1] = R[2, 2] = R[3, 3] = c
    R[0, 2] = R[1, 3] = s
    R[2, 0] = R[3, 1] = -s
    return R


def shift(mx: float, my: float) -> np.ndarray:
    """Transverse affine displacement via the constant 7th component."""
    R = np.eye(7)
    R[0, 6] = mx
    R[2, 6] = my
    return R


def tilt_sandwich(R: np.ndarray, tilt: float) -> np.ndarray:
    return rotation(-tilt) @ R @ rotation(tilt)


def misalignment_sandwich(R: np.ndarray, mx: float, my: float) -> np.ndarray:
    return shift(mx, my) @ R @ shift(-mx, -my)


def quadrupole_map(
    length: float,
    k1: float,
    energy: float,
    tilt: float = 0.0,
    misalignment=(0.0, 0.0),
) -> np.ndarray:
    R = tilt_sandwich(sector_body_map(length, k1, 0.0, energy), tilt)
    return misalignment_sandwich(R, *misalignment)


def dipole_edge_map(hx: float, e: float, fint: float, gap: float) -> np.ndarray:
    """Hard-edge wedge (MAD-8/Bmad edge focusing with fringe-field
    correction psi)."""
    psi = fint * hx * gap * (1.0 + np.sin(e) ** 2) / np.cos(e)
    R = np.eye(7)
    R[1, 0] = hx * np.tan(e)
    R[3, 2] = -hx * np.tan(e - psi)
    return R


def dipole_map(
    length: float,
    angle: float,
    energy: float,
    e1: float = 0.0,
    e2: float = 0.0,
    tilt: float = 0.0,
    fringe_integral: float = 0.0,
    fringe_integral_exit: float = None,
    gap: float = 0.0,
) -> np.ndarray:
    if fringe_integral_exit is None:
        fringe_integral_exit = fringe_integral
    if length == 0.0:  # thin-kick branch
        R = np.eye(7)
        R[2, 6] = angle
        return tilt_sandwich(R, tilt)
    hx = angle / length
    body = sector_body_map(length, 0.0, hx, energy)
    R = (
        dipole_edge_map(hx, e2, fringe_integral_exit, gap)
        @ body
        @ dipole_edge_map(hx, e1, fringe_integral, gap)
    )
    return tilt_sandwich(R, tilt)


def rbend_map(length: float, angle: float, energy: float, **kwargs):
    """Rectangular bend: sector bend with both edges rotated by angle/2."""
    e1 = kwargs.pop("e1", 0.0) + angle / 2
    e2 = kwargs.pop("e2", 0.0) + angle / 2
    return dipole_map(length, angle, energy, e1=e1, e2=e2, **kwargs)


def solenoid_map(
    length: float, k: float, energy: float, misalignment=(0.0, 0.0)
) -> np.ndarray:
    """Chao-form solenoid: generator of the coupled x-y system
    (derived as dM/dL at L = 0 from the Larmor-rotation dynamics)."""
    gamma, beta, igamma2 = relativistic(energy)
    A = np.zeros((7, 7))
    A[0, 1] = 1.0
    A[0, 2] = k
    A[1, 0] = -(k**2)
    A[1, 3] = k
    A[2, 0] = -k
    A[2, 3] = 1.0
    A[3, 1] = -k
    A[3, 2] = -(k**2)
    if gamma != 0:
        # Solenoid r56 convention: -L/(beta^2 gamma^2) == -L igamma2/beta^2.
        A[4, 5] = -igamma2 / beta**2
    return misalignment_sandwich(expm(A * length), *misalignment)


def corrector_map(
    length: float, angle: float, energy: float, horizontal: bool
) -> np.ndarray:
    """Drift followed by a thin kick at the exit face — reproduces the
    Cheetah convention R[kick_row, 6] = angle with no displacement term."""
    kick = np.eye(7)
    kick[1 if horizontal else 3, 6] = angle
    return kick @ drift_map(length, energy)


def undulator_map(length: float, energy: float) -> np.ndarray:
    """Drift-like with the reference's +L/gamma^2 longitudinal quirk."""
    gamma, beta, igamma2 = relativistic(energy)
    A = np.zeros((7, 7))
    A[0, 1] = 1.0
    A[2, 3] = 1.0
    A[4, 5] = igamma2  # note: NOT divided by beta^2, and positive
    return expm(A * length)


def sample_cloud(n: int, seed: int = 0, scale=None) -> np.ndarray:
    """Deterministic random particle cloud (..., 7) with unit 7th column."""
    rng = np.random.default_rng(seed)
    if scale is None:
        scale = np.array([1e-3, 1e-4, 1e-3, 1e-4, 1e-3, 5e-3])
    P = np.ones((n, 7))
    P[:, :6] = rng.standard_normal((n, 6)) * scale
    return P


def track_cloud(maps, P: np.ndarray) -> np.ndarray:
    """Apply a sequence of 7x7 maps (first applied first) to a cloud."""
    R = np.eye(7)
    for m in maps:
        R = m @ R
    return P @ R.T


def aperture_survivors(
    P: np.ndarray, x_max: float, y_max: float, shape: str
) -> np.ndarray:
    """Independent survival mask (reference ``aperture.py:69-109``
    semantics: strict inequality for rectangular, inclusive ellipse)."""
    x, y = P[..., 0], P[..., 2]
    if shape == "rectangular":
        return (np.abs(x) < x_max) & (np.abs(y) < y_max)
    if shape == "elliptical":
        return (x / x_max) ** 2 + (y / y_max) ** 2 <= 1.0
    raise ValueError(shape)
