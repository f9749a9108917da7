"""Unit tests for the transfer-matrix kernels against independent formulas.

Mirrors the reference's ground-truth strategy (SURVEY.md §4 cat. 1) using
closed-form complex-path evaluation as the oracle instead of a live Ocelot.
"""

import cmath

import jax.numpy as jnp
import numpy as np
import pytest

from lynx_tpu.constants import REST_ENERGY_EV
from lynx_tpu.ops import (
    base_rmatrix,
    drift_rmatrix,
    fold_transfer_maps,
    misalignment_matrix,
    rotation_matrix,
)


def reference_base_rmatrix(length, k1, hx, energy):
    """Complex-path evaluation of the universal R-matrix (the formula the
    reference implements in ``lynx/track_methods.py:37-105``)."""
    gamma = energy / REST_ENERGY_EV
    igamma2 = 1 / gamma**2 if gamma != 0 else 1.0
    beta = np.sqrt(1 - igamma2)
    k1 = k1 if k1 != 0 else 1e-12
    kx2 = k1 + hx**2
    ky2 = -k1
    kx = cmath.sqrt(kx2)
    ky = cmath.sqrt(ky2)
    cx = cmath.cos(kx * length).real
    cy = cmath.cos(ky * length).real
    sx = (cmath.sin(kx * length) / kx).real
    sy = (cmath.sin(ky * length) / ky).real
    dx = hx / kx2 * (1 - cx)
    r56 = hx**2 * (length - sx) / kx2 / beta**2 - length / beta**2 * igamma2

    R = np.eye(7)
    R[0, 0] = cx
    R[0, 1] = sx
    R[0, 5] = dx / beta
    R[1, 0] = -kx2 * sx
    R[1, 1] = cx
    R[1, 5] = sx * hx / beta
    R[2, 2] = cy
    R[2, 3] = sy
    R[3, 2] = -ky2 * sy
    R[3, 3] = cy
    R[4, 0] = sx * hx / beta
    R[4, 1] = dx / beta
    R[4, 5] = r56
    return R


@pytest.mark.parametrize(
    "length,k1,hx",
    [
        (0.5, 4.2, 0.0),  # focusing quad
        (0.5, -4.2, 0.0),  # defocusing quad
        (0.31, 0.0, 0.2),  # pure sector bend
        (0.31, 1.7, 0.1),  # combined function
        (1.0, 0.0, 0.0),  # drift-like
    ],
)
def test_base_rmatrix_against_complex_path(length, k1, hx):
    energy = 1.5e8
    expected = reference_base_rmatrix(length, k1, hx, energy)
    got = base_rmatrix(
        jnp.array(length, dtype=jnp.float64),
        jnp.array(k1, dtype=jnp.float64),
        jnp.array(hx, dtype=jnp.float64),
        energy=jnp.array(energy, dtype=jnp.float64),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12, atol=1e-14)


def test_base_rmatrix_tilt_sandwich():
    """Tilting by pi is equivalent to no tilt for a quad (180-degree symmetry),
    and tilt(t) == rot(-t) R rot(t)."""
    args = dict(
        length=jnp.array(0.5, dtype=jnp.float64),
        k1=jnp.array(3.3, dtype=jnp.float64),
        hx=jnp.array(0.0, dtype=jnp.float64),
        energy=jnp.array(1e8, dtype=jnp.float64),
    )
    R0 = base_rmatrix(**args)
    Rtilt = base_rmatrix(**args, tilt=jnp.array(0.4, dtype=jnp.float64))
    rot = rotation_matrix(jnp.array(0.4, dtype=jnp.float64))
    rot_inv = rotation_matrix(jnp.array(-0.4, dtype=jnp.float64))
    np.testing.assert_allclose(
        np.asarray(Rtilt), np.asarray(rot_inv @ R0 @ rot), rtol=1e-12, atol=1e-15
    )
    Rpi = base_rmatrix(**args, tilt=jnp.array(np.pi, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(Rpi), np.asarray(R0), rtol=1e-9, atol=1e-12)


def test_misalignment_matrices_are_inverse_shifts():
    m = jnp.array([1e-3, -2e-3], dtype=jnp.float64)
    R_entry, R_exit = misalignment_matrix(m)
    np.testing.assert_allclose(
        np.asarray(R_exit @ R_entry), np.eye(7), rtol=0, atol=1e-15
    )
    assert float(R_entry[0, 6]) == -1e-3
    assert float(R_entry[2, 6]) == 2e-3


def test_drift_rmatrix_r56():
    energy = 1e8
    gamma = energy / REST_ENERGY_EV
    igamma2 = 1 / gamma**2
    beta2 = 1 - igamma2
    R = drift_rmatrix(jnp.array(2.0, dtype=jnp.float64), jnp.array(energy, dtype=jnp.float64))
    assert float(R[0, 1]) == 2.0
    np.testing.assert_allclose(float(R[4, 5]), -2.0 * igamma2 / beta2, rtol=1e-12)


def test_fold_transfer_maps_matches_sequential():
    rng = np.random.default_rng(0)
    maps = jnp.asarray(
        np.eye(7) + 0.01 * rng.standard_normal((11, 7, 7)), dtype=jnp.float64
    )
    folded = fold_transfer_maps(maps)
    sequential = np.eye(7)
    for m in np.asarray(maps):
        sequential = m @ sequential
    np.testing.assert_allclose(np.asarray(folded), sequential, rtol=1e-12)


def test_fold_transfer_maps_batched():
    rng = np.random.default_rng(1)
    maps = jnp.asarray(
        np.eye(7) + 0.01 * rng.standard_normal((5, 3, 7, 7)), dtype=jnp.float64
    )
    folded = fold_transfer_maps(maps)
    assert folded.shape == (3, 7, 7)
    for b in range(3):
        sequential = np.eye(7)
        for i in range(5):
            sequential = np.asarray(maps)[i, b] @ sequential
        np.testing.assert_allclose(np.asarray(folded[b]), sequential, rtol=1e-12)
