"""Checked-in golden tracking regressions.

A deterministic (linspaced, RNG-free) f64 beam tracked through
representative lattices; outputs are pinned at 1e-12 so numerics refactors
cannot silently drift (SURVEY.md §4/M5: golden files replace live-Ocelot
comparisons).  Regenerate with the script in the file header of
``tests/resources/golden_tracking.npz``'s git history if physics
*intentionally* changes — and say why in the commit.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt

GOLDEN = Path(__file__).parent / "resources" / "golden_tracking.npz"

f64 = jnp.float64


def _beam():
    return lt.ParticleBeam.make_linspaced(
        num_particles=32,
        mu_x=jnp.array([1e-4], dtype=f64),
        mu_xp=jnp.array([-2e-5], dtype=f64),
        mu_y=jnp.array([-5e-5], dtype=f64),
        mu_yp=jnp.array([1e-5], dtype=f64),
        sigma_x=jnp.array([2e-4], dtype=f64),
        sigma_xp=jnp.array([3e-5], dtype=f64),
        sigma_y=jnp.array([1.5e-4], dtype=f64),
        sigma_yp=jnp.array([2.5e-5], dtype=f64),
        sigma_s=jnp.array([1e-5], dtype=f64),
        sigma_p=jnp.array([2e-3], dtype=f64),
        energy=jnp.array([1.2e8], dtype=f64),
        dtype=f64,
    )


def _segments():
    return {
        "dqd": lt.Segment(
            [
                lt.Drift(jnp.array([0.5], dtype=f64), dtype=f64),
                lt.Quadrupole(
                    jnp.array([0.23], dtype=f64),
                    k1=jnp.array([4.2], dtype=f64),
                    tilt=jnp.array([0.1], dtype=f64),
                    dtype=f64,
                ),
                lt.Drift(jnp.array([0.5], dtype=f64), dtype=f64),
            ]
        ),
        "bend_line": lt.Segment(
            [
                lt.Dipole(
                    jnp.array([0.31], dtype=f64),
                    angle=jnp.array([0.12], dtype=f64),
                    e1=jnp.array([0.05], dtype=f64),
                    e2=jnp.array([0.03], dtype=f64),
                    fringe_integral=jnp.array([0.4], dtype=f64),
                    gap=jnp.array([0.05], dtype=f64),
                    tilt=jnp.array([0.2], dtype=f64),
                    dtype=f64,
                ),
                lt.Drift(jnp.array([0.4], dtype=f64), dtype=f64),
                lt.RBend(
                    jnp.array([0.25], dtype=f64),
                    angle=jnp.array([-0.08], dtype=f64),
                    dtype=f64,
                ),
            ]
        ),
        "sol_und_corr": lt.Segment(
            [
                lt.Solenoid(
                    jnp.array([0.4], dtype=f64),
                    k=jnp.array([1.3], dtype=f64),
                    misalignment=jnp.array([[1e-4, -2e-4]], dtype=f64),
                    dtype=f64,
                ),
                lt.Undulator(jnp.array([0.35], dtype=f64), dtype=f64),
                lt.HorizontalCorrector(
                    jnp.array([0.1], dtype=f64),
                    angle=jnp.array([3e-4], dtype=f64),
                    dtype=f64,
                ),
                lt.VerticalCorrector(
                    jnp.array([0.1], dtype=f64),
                    angle=jnp.array([-2e-4], dtype=f64),
                    dtype=f64,
                ),
            ]
        ),
        "cavity_line": lt.Segment(
            [
                lt.Drift(jnp.array([0.2], dtype=f64), dtype=f64),
                lt.Cavity(
                    jnp.array([1.0377], dtype=f64),
                    voltage=jnp.array([1.815975e7], dtype=f64),
                    phase=jnp.array([-12.0], dtype=f64),
                    frequency=jnp.array([1.3e9], dtype=f64),
                    dtype=f64,
                ),
                lt.Drift(jnp.array([0.2], dtype=f64), dtype=f64),
            ]
        ),
    }


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_incoming_beam_is_reproduced(golden):
    np.testing.assert_allclose(
        np.asarray(_beam().particles), golden["incoming_particles"],
        rtol=1e-14, atol=0,
    )


@pytest.mark.parametrize("name", ["dqd", "bend_line", "sol_und_corr", "cavity_line"])
def test_tracking_matches_golden(golden, name):
    beam = _beam()
    tracked = _segments()[name].track(beam)
    np.testing.assert_allclose(
        np.asarray(tracked.particles),
        golden[f"{name}_particles"],
        rtol=1e-12,
        atol=1e-18,
    )
    np.testing.assert_allclose(
        np.asarray(tracked.energy), golden[f"{name}_energy"], rtol=1e-14
    )
