"""Linear-optics transfer-matrix kernels.

Every lattice element maps the 7-dimensional trace-space state
``(x, x', y, y', s, p, 1)`` linearly: ``state' = R @ state`` with ``R`` a
``(..., 7, 7)`` matrix.  The constant 7th component turns affine kicks
(correctors, misalignments) into pure matmuls.

These kernels are *branch-free*: where the reference uses in-place masked
assignment (illegal in JAX, e.g. reference ``lynx/track_methods.py:60-77``)
we use ``jnp.where`` with guarded operands so that the functions are
jit/vmap/grad-safe and numerically identical in the non-degenerate regime.

Behavioral parity sources (formulas, not code):
 * ``base_rmatrix``      — reference ``lynx/track_methods.py:37-105``
 * ``rotation_matrix``   — reference ``lynx/track_methods.py:14-34``
 * ``misalignment_matrix`` — reference ``lynx/track_methods.py:108-122``
 * ``drift_rmatrix``     — reference ``lynx/accelerator/drift.py:44-62``
 * ``cavity_rmatrix``    — reference ``lynx/accelerator/cavity.py:248-325``
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lynx_tpu.constants import ELECTRON_MASS_EV, REST_ENERGY_EV, SPEED_OF_LIGHT

Array = jax.Array


def build_rmatrix(
    entries: Dict[Tuple[int, int], Array],
    batch_shape: Tuple[int, ...],
    dtype: jnp.dtype,
) -> Array:
    """Assemble a batched 7x7 matrix: identity plus the given entries."""
    R = jnp.broadcast_to(jnp.eye(7, dtype=dtype), (*batch_shape, 7, 7))
    for (i, j), value in entries.items():
        R = R.at[..., i, j].set(
            jnp.broadcast_to(jnp.asarray(value, dtype=dtype), batch_shape)
        )
    return R


def _safe_div(num: Array, den: Array, fallback: Array | float = 0.0) -> Array:
    """num / den, with entries where den == 0 replaced by ``fallback``."""
    den_safe = jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, fallback, num / den_safe)


def igamma2_from_energy(energy: Array, zero_value: float = 0.0) -> Array:
    """1/gamma^2 with gamma = E / (m_e c^2 / e); ``zero_value`` where E == 0.

    The reference uses ``zero_value=0`` in drift-like elements
    (``drift.py:53-54``) and ``zero_value=1`` inside ``base_rmatrix``
    (``track_methods.py:61-62``); both conventions are supported.
    """
    gamma = energy / REST_ENERGY_EV
    gamma_safe = jnp.where(gamma == 0, 1.0, gamma)
    return jnp.where(gamma == 0, zero_value, 1.0 / gamma_safe**2)


def _cos_sinc(k2: Array, length: Array) -> Tuple[Array, Array]:
    """Return (cos(k L), sin(k L)/k) for k = sqrt(k2), valid for k2 of any sign.

    For k2 < 0 this is (cosh(|k| L), sinh(|k| L)/|k|) — the real part of the
    complex-sqrt formulation the reference uses (``track_methods.py:72-79``).
    """
    abs_k = jnp.sqrt(jnp.abs(k2))
    arg = abs_k * length
    focusing = k2 >= 0
    c = jnp.where(focusing, jnp.cos(arg), jnp.cosh(arg))
    s_over_k = _safe_div(
        jnp.where(focusing, jnp.sin(arg), jnp.sinh(arg)), abs_k, fallback=length
    )
    return c, s_over_k


def rotation_matrix(angle: Array) -> Array:
    """x-y plane rotation of the transfer map (reference ``track_methods.py:14-34``)."""
    angle = jnp.asarray(angle)
    cs = jnp.cos(angle)
    sn = jnp.sin(angle)
    return build_rmatrix(
        {
            (0, 0): cs,
            (0, 2): sn,
            (1, 1): cs,
            (1, 3): sn,
            (2, 0): -sn,
            (2, 2): cs,
            (3, 1): -sn,
            (3, 3): cs,
        },
        batch_shape=angle.shape,
        dtype=angle.dtype,
    )


def base_rmatrix(
    length: Array,
    k1: Array,
    hx: Array,
    tilt: Optional[Array] = None,
    energy: Optional[Array] = None,
) -> Array:
    """Universal linear R-matrix for quadrupoles and bends.

    Handles quad strength ``k1``, curvature ``hx``, tilt rotation and the
    energy-dependent longitudinal ``r56`` term.  Reference behavior:
    ``lynx/track_methods.py:37-105`` (itself Ocelot's ``uni_matrix``).
    """
    length = jnp.asarray(length)
    dtype = length.dtype
    k1 = jnp.asarray(k1, dtype=dtype)
    hx = jnp.asarray(hx, dtype=dtype)
    tilt = jnp.zeros_like(length) if tilt is None else jnp.asarray(tilt, dtype=dtype)
    energy = (
        jnp.zeros_like(length) if energy is None else jnp.asarray(energy, dtype=dtype)
    )

    batch_shape = jnp.broadcast_shapes(
        length.shape, k1.shape, hx.shape, tilt.shape, energy.shape
    )
    length, k1, hx, tilt, energy = (
        jnp.broadcast_to(a, batch_shape) for a in (length, k1, hx, tilt, energy)
    )

    # NOTE: the reference sets igamma2 = 1 (not 0) for E == 0 here.
    igamma2 = igamma2_from_energy(energy, zero_value=1.0)
    beta = jnp.sqrt(1.0 - igamma2)

    # Avoid k1 == 0 degeneracy exactly like the reference (k1 -> 1e-12).
    k1 = jnp.where(k1 == 0, 1e-12, k1)
    kx2 = k1 + hx**2
    ky2 = -k1

    cx, sx = _cos_sinc(kx2, length)
    cy, sy = _cos_sinc(ky2, length)

    dx = hx / kx2 * (1.0 - cx)
    beta_safe = jnp.where(beta == 0, 1.0, beta)
    inv_beta = jnp.where(beta == 0, jnp.inf, 1.0 / beta_safe)
    r56 = hx**2 * (length - sx) / kx2 * inv_beta**2 - length * inv_beta**2 * igamma2

    R = build_rmatrix(
        {
            (0, 0): cx,
            (0, 1): sx,
            (0, 5): dx * inv_beta,
            (1, 0): -kx2 * sx,
            (1, 1): cx,
            (1, 5): sx * hx * inv_beta,
            (2, 2): cy,
            (2, 3): sy,
            (3, 2): -ky2 * sy,
            (3, 3): cy,
            (4, 0): sx * hx * inv_beta,
            (4, 1): dx * inv_beta,
            (4, 5): r56,
        },
        batch_shape=batch_shape,
        dtype=dtype,
    )

    # Rotate for skew / vertical magnets: R <- rot(-tilt) @ R @ rot(tilt).
    # Applied unconditionally (exact for tilt == 0) to stay branch-free.
    R = rotation_matrix(-tilt) @ R @ rotation_matrix(tilt)
    return R


def misalignment_matrix(misalignment: Array) -> Tuple[Array, Array]:
    """(entry, exit) affine shift matrices for a transversely misaligned element.

    Reference ``lynx/track_methods.py:108-122``.
    """
    misalignment = jnp.asarray(misalignment)
    batch_shape = misalignment.shape[:-1]
    dtype = misalignment.dtype
    mx = misalignment[..., 0]
    my = misalignment[..., 1]
    R_entry = build_rmatrix({(0, 6): -mx, (2, 6): -my}, batch_shape, dtype)
    R_exit = build_rmatrix({(0, 6): mx, (2, 6): my}, batch_shape, dtype)
    return R_entry, R_exit


def drift_rmatrix(length: Array, energy: Array) -> Array:
    """Drift transfer map with r56 = -L / (beta^2 gamma^2).

    Reference ``lynx/accelerator/drift.py:44-62``.
    """
    length = jnp.asarray(length)
    dtype = length.dtype
    energy = jnp.asarray(energy, dtype=dtype)
    batch_shape = jnp.broadcast_shapes(length.shape, energy.shape)
    length = jnp.broadcast_to(length, batch_shape)
    energy = jnp.broadcast_to(energy, batch_shape)

    igamma2 = igamma2_from_energy(energy, zero_value=0.0)
    beta2 = 1.0 - igamma2
    r56 = -length * _safe_div(igamma2, beta2, fallback=0.0)
    return build_rmatrix(
        {(0, 1): length, (2, 3): length, (4, 5): r56},
        batch_shape=batch_shape,
        dtype=dtype,
    )


def cavity_rmatrix(
    length: Array,
    voltage: Array,
    phase: Array,
    frequency: Array,
    energy: Array,
) -> Array:
    """Linear map of an accelerating RF cavity (pi-standing-wave model).

    Rosenzweig-Serafini-style transverse focusing plus the longitudinal
    (r55_cor, r56, r65, r66) block.  Reference behavior:
    ``lynx/accelerator/cavity.py:248-325``.

    Branch-free extension over the reference: entries of the batch where the
    cavity is effectively off (``V == 0``, ``E == 0`` or ``V cos(phi) == 0``)
    fall back to the correct analytic limit (a drift in the transverse plane
    plus the well-defined r65/r66 chirp terms) instead of producing NaNs.
    This is required for vectorized lattices that mix on/off cavities in one
    batch (reference test contract ``tests/test_vectorized.py:423-439``).
    """
    length = jnp.asarray(length)
    dtype = length.dtype
    voltage = jnp.asarray(voltage, dtype=dtype)
    phase = jnp.asarray(phase, dtype=dtype)
    frequency = jnp.asarray(frequency, dtype=dtype)
    energy = jnp.asarray(energy, dtype=dtype)

    batch_shape = jnp.broadcast_shapes(
        length.shape, voltage.shape, phase.shape, frequency.shape, energy.shape
    )
    length, voltage, phase, frequency, energy = (
        jnp.broadcast_to(a, batch_shape)
        for a in (length, voltage, phase, frequency, energy)
    )

    phi = jnp.deg2rad(phase)
    cos_phi = jnp.cos(phi)
    delta_energy = voltage * cos_phi
    # "On" = the accelerating branch of the formulas is non-degenerate.
    is_on = (voltage != 0) & (energy != 0) & (delta_energy != 0)

    energy_safe = jnp.where(energy == 0, 1.0, energy)
    Ei = energy_safe / ELECTRON_MASS_EV
    Ef = (energy_safe + jnp.where(is_on, delta_energy, 0.0)) / ELECTRON_MASS_EV
    Ef_safe = jnp.where(is_on, Ef, Ei + 1.0)  # avoid Ef == Ei in denominators
    Ep = (Ef_safe - Ei) / length  # energy gain per meter (in units of m_e)

    eta = 1.0
    cos_phi_safe = jnp.where(cos_phi == 0, 1.0, cos_phi)
    alpha = jnp.sqrt(eta / 8.0) / cos_phi_safe * jnp.log(Ef_safe / Ei)
    sin_alpha = jnp.sin(alpha)

    r11 = jnp.cos(alpha) - jnp.sqrt(2.0 / eta) * cos_phi * sin_alpha
    # In Ocelot r12 uses a |Ep| > 10 guard; the reference (following Bmad)
    # always uses the analytic expression (``cavity.py:266-269``).
    r12 = jnp.sqrt(8.0 / eta) * Ei / Ep * cos_phi * sin_alpha
    r21 = (
        -Ep
        / Ef_safe
        * (cos_phi / jnp.sqrt(2.0 * eta) + jnp.sqrt(eta / 8.0) / cos_phi_safe)
        * sin_alpha
    )
    r22 = Ei / Ef_safe * (jnp.cos(alpha) + jnp.sqrt(2.0 / eta) * cos_phi * sin_alpha)

    beta0 = jnp.sqrt(1.0 - 1.0 / Ei**2)
    beta1 = jnp.sqrt(1.0 - 1.0 / Ef_safe**2)

    k = 2.0 * jnp.pi * frequency / SPEED_OF_LIGHT
    r56_on = (
        -length / (Ef_safe**2 * Ei * beta1) * (Ef_safe + Ei) / (beta1 + beta0)
    )
    g0 = Ei
    g1 = Ef_safe
    dg = jnp.where(is_on, g0 - g1, 1.0)
    r55_cor = (
        k
        * length
        * beta0
        * voltage
        / ELECTRON_MASS_EV
        * jnp.sin(phi)
        * (g0 * g1 * (beta0 * beta1 - 1.0) + 1.0)
        / (beta1 * g1 * dg**2)
    )

    # r65/r66 are well-defined even at the zero-crossing (V cos(phi) == 0).
    Ef_actual = (energy_safe + delta_energy) / ELECTRON_MASS_EV
    Ef_actual_safe = jnp.where(Ef_actual > 1.0, Ef_actual, Ei)
    beta1_actual = jnp.sqrt(1.0 - 1.0 / Ef_actual_safe**2)
    has_beam = energy != 0
    r66 = jnp.where(
        has_beam, Ei / Ef_actual_safe * beta0 / beta1_actual, 1.0
    )
    r65 = jnp.where(
        has_beam & (voltage != 0),
        k * jnp.sin(phi) * voltage / (Ef_actual_safe * beta1_actual * ELECTRON_MASS_EV),
        0.0,
    )

    # Drift fallback for degenerate entries (the analytic V -> 0 limit).
    igamma2 = igamma2_from_energy(energy, zero_value=0.0)
    beta2 = 1.0 - igamma2
    drift_r56 = -length * _safe_div(igamma2, beta2, fallback=0.0)

    r11 = jnp.where(is_on, r11, 1.0)
    r12 = jnp.where(is_on, r12, length)
    r21 = jnp.where(is_on, r21, 0.0)
    r22 = jnp.where(is_on, r22, 1.0)
    r56 = jnp.where(is_on, r56_on, drift_r56)
    r55 = jnp.where(is_on, 1.0 + r55_cor, 1.0)

    return build_rmatrix(
        {
            (0, 0): r11,
            (0, 1): r12,
            (1, 0): r21,
            (1, 1): r22,
            (2, 2): r11,
            (2, 3): r12,
            (3, 2): r21,
            (3, 3): r22,
            (4, 4): r55,
            (4, 5): r56,
            (5, 4): r65,
            (5, 5): r66,
        },
        batch_shape=batch_shape,
        dtype=dtype,
    )
