"""External-oracle tracking goldens (the reference's live-Ocelot
comparison matrix, reference ``tests/test_compare_ocelot.py:39-287``).

Ocelot/Cheetah cannot be installed here, so the independent authority is
``tests/oracles/generator_oracle.py``: transfer maps derived by
numerically exponentiating the infinitesimal generators of the equations
of motion (scipy, float64) — a different derivation path from the
package's closed-form matrices.  Particle clouds are propagated through
both and compared at float64 tolerances, mirroring the reference's
matrix: dipole (f64, fringe, fringe+tilt+asymmetric e1/e2), rbend,
tilted/misaligned quadrupole, solenoid, correctors, aperture survivor
counts, and the full ARES EA lattice end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu.functional import track
from oracles import generator_oracle as go

F64 = jnp.float64
ENERGY = 1.073e8  # eV, the ARES working point used throughout the reference
N = 4096


def particle_beam(P: np.ndarray) -> lt.ParticleBeam:
    return lt.ParticleBeam(
        particles=jnp.asarray(P, F64),
        energy=jnp.asarray([ENERGY], F64),
        particle_charges=jnp.full((1, P.shape[0]), 1e-15, F64),
    )


def track_ours(element, P: np.ndarray) -> np.ndarray:
    out = element.track(particle_beam(P[None]))
    return np.asarray(out.particles[0])


def assert_clouds_match(ours: np.ndarray, oracle: np.ndarray, atol=1e-12):
    np.testing.assert_allclose(ours, oracle, rtol=1e-9, atol=atol)


@pytest.fixture(scope="module")
def cloud() -> np.ndarray:
    return go.sample_cloud(N, seed=42)


def test_dipole_f64(cloud):
    """Reference ``test_compare_ocelot.py:39-65`` (float64 dipole)."""
    element = lt.Dipole(
        length=jnp.asarray([0.6], F64), angle=jnp.asarray([0.2], F64), dtype=F64
    )
    oracle = go.track_cloud([go.dipole_map(0.6, 0.2, ENERGY)], cloud)
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_dipole_with_fringe(cloud):
    element = lt.Dipole(
        length=jnp.asarray([0.6], F64),
        angle=jnp.asarray([0.2], F64),
        fringe_integral=jnp.asarray([0.5], F64),
        gap=jnp.asarray([0.03], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [go.dipole_map(0.6, 0.2, ENERGY, fringe_integral=0.5, gap=0.03)], cloud
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_dipole_fringe_tilt_asymmetric_edges(cloud):
    """Asymmetric e1/e2 + separate exit fringe integral + tilt (reference's
    hardest dipole case)."""
    element = lt.Dipole(
        length=jnp.asarray([0.6], F64),
        angle=jnp.asarray([0.2], F64),
        e1=jnp.asarray([0.07], F64),
        e2=jnp.asarray([-0.03], F64),
        tilt=jnp.asarray([0.3], F64),
        fringe_integral=jnp.asarray([0.5], F64),
        fringe_integral_exit=jnp.asarray([0.2], F64),
        gap=jnp.asarray([0.03], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [
            go.dipole_map(
                0.6,
                0.2,
                ENERGY,
                e1=0.07,
                e2=-0.03,
                tilt=0.3,
                fringe_integral=0.5,
                fringe_integral_exit=0.2,
                gap=0.03,
            )
        ],
        cloud,
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_rbend(cloud):
    """RBend == sector bend with e1/e2 += angle/2 (single adjustment; the
    reference's double-``__init__`` bug is not reproduced)."""
    element = lt.RBend(
        length=jnp.asarray([0.6], F64),
        angle=jnp.asarray([0.2], F64),
        e1=jnp.asarray([0.01], F64),
        e2=jnp.asarray([0.02], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [go.rbend_map(0.6, 0.2, ENERGY, e1=0.01, e2=0.02)], cloud
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_zero_length_dipole_thin_kick(cloud):
    element = lt.Dipole(
        length=jnp.asarray([0.0], F64), angle=jnp.asarray([3e-3], F64), dtype=F64
    )
    oracle = go.track_cloud([go.dipole_map(0.0, 3e-3, ENERGY)], cloud)
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_tilted_quadrupole(cloud):
    """Reference's tilted-quad case (``test_compare_ocelot.py``)."""
    element = lt.Quadrupole(
        length=jnp.asarray([0.23], F64),
        k1=jnp.asarray([5.0], F64),
        tilt=jnp.asarray([0.79], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [go.quadrupole_map(0.23, 5.0, ENERGY, tilt=0.79)], cloud
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_misaligned_quadrupole(cloud):
    element = lt.Quadrupole(
        length=jnp.asarray([0.23], F64),
        k1=jnp.asarray([-4.0], F64),
        misalignment=jnp.asarray([[3e-4, -2e-4]], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [go.quadrupole_map(0.23, -4.0, ENERGY, misalignment=(3e-4, -2e-4))],
        cloud,
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_solenoid(cloud):
    element = lt.Solenoid(
        length=jnp.asarray([0.7], F64), k=jnp.asarray([3.0], F64), dtype=F64
    )
    oracle = go.track_cloud([go.solenoid_map(0.7, 3.0, ENERGY)], cloud)
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_misaligned_solenoid(cloud):
    element = lt.Solenoid(
        length=jnp.asarray([0.7], F64),
        k=jnp.asarray([3.0], F64),
        misalignment=jnp.asarray([[1e-4, 2e-4]], F64),
        dtype=F64,
    )
    oracle = go.track_cloud(
        [go.solenoid_map(0.7, 3.0, ENERGY, misalignment=(1e-4, 2e-4))], cloud
    )
    assert_clouds_match(track_ours(element, cloud), oracle)


def test_correctors(cloud):
    h = lt.HorizontalCorrector(
        length=jnp.asarray([0.12], F64), angle=jnp.asarray([2e-3], F64), dtype=F64
    )
    v = lt.VerticalCorrector(
        length=jnp.asarray([0.12], F64), angle=jnp.asarray([-1e-3], F64), dtype=F64
    )
    oracle = go.track_cloud(
        [
            go.corrector_map(0.12, 2e-3, ENERGY, horizontal=True),
            go.corrector_map(0.12, -1e-3, ENERGY, horizontal=False),
        ],
        cloud,
    )
    ours = track_ours(v, track_ours(h, cloud))
    assert_clouds_match(ours, oracle)


def test_undulator(cloud):
    element = lt.Undulator(length=jnp.asarray([0.9], F64), dtype=F64)
    oracle = go.track_cloud([go.undulator_map(0.9, ENERGY)], cloud)
    assert_clouds_match(track_ours(element, cloud), oracle)


# -- apertures (reference survivor-count cases) -----------------------------


@pytest.mark.parametrize("shape", ["rectangular", "elliptical"])
def test_aperture_survivor_counts(cloud, shape):
    x_max, y_max = 1e-3, 7e-4
    element = lt.Aperture(
        x_max=jnp.asarray([x_max], F64),
        y_max=jnp.asarray([y_max], F64),
        shape=shape,
        is_active=True,
        dtype=F64,
    )
    out = element.track(particle_beam(cloud[None]))
    expected_mask = go.aperture_survivors(cloud, x_max, y_max, shape)
    assert int(out.num_particles_survived[0]) == int(expected_mask.sum())
    # Weighted moments must equal the moments of the independent cull.
    survivors = cloud[expected_mask]
    np.testing.assert_allclose(
        float(out.mu_x[0]), survivors[:, 0].mean(), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(out.sigma_x[0]), survivors[:, 0].std(ddof=1), rtol=1e-9
    )


def test_aperture_then_tracking_moments(cloud):
    """Cull then drift: weighted stats equal the oracle's culled cloud
    propagated with the oracle drift."""
    x_max, y_max = 1e-3, 7e-4
    segment = lt.Segment(
        [
            lt.Aperture(
                x_max=jnp.asarray([x_max], F64),
                y_max=jnp.asarray([y_max], F64),
                shape="rectangular",
                is_active=True,
                dtype=F64,
            ),
            lt.Drift(length=jnp.asarray([2.0], F64), dtype=F64),
        ]
    )
    out = segment.track(particle_beam(cloud[None]))
    mask = go.aperture_survivors(cloud, x_max, y_max, "rectangular")
    oracle = go.track_cloud([go.drift_map(2.0, ENERGY)], cloud[mask])
    np.testing.assert_allclose(float(out.mu_x[0]), oracle[:, 0].mean(), rtol=1e-9)
    np.testing.assert_allclose(
        float(out.sigma_x[0]), oracle[:, 0].std(ddof=1), rtol=1e-9
    )


# -- full-lattice end-to-end (reference ``test_compare_ocelot.py:248-287``) --


def _oracle_map_for(element) -> np.ndarray:
    """Build the oracle map for one lynx element from its parameters."""

    def val(x):
        return float(np.asarray(x).ravel()[0])

    name = type(element).__name__
    if name == "Drift":
        return go.drift_map(val(element.length), ENERGY)
    if name == "Quadrupole":
        return go.quadrupole_map(
            val(element.length),
            val(element.k1),
            ENERGY,
            tilt=val(element.tilt),
            misalignment=tuple(np.asarray(element.misalignment).ravel()[:2]),
        )
    if name == "HorizontalCorrector":
        return go.corrector_map(
            val(element.length), val(element.angle), ENERGY, horizontal=True
        )
    if name == "VerticalCorrector":
        return go.corrector_map(
            val(element.length), val(element.angle), ENERGY, horizontal=False
        )
    if name in ("Marker", "BPM", "Screen"):
        return np.eye(7)
    if name == "Undulator":
        return go.undulator_map(val(element.length), ENERGY)
    raise NotImplementedError(name)


def test_ares_ea_end_to_end(cloud):
    """Full ARES EA subcell with tuned magnets: our tracked cloud vs the
    oracle's composed expm maps (the reference's flagship end-to-end
    live-Ocelot comparison, ``test_compare_ocelot.py:248-287``)."""
    from lynx_tpu.models import ares_ea_segment

    segment = ares_ea_segment()
    segment = jax.tree_util.tree_map(
        lambda x: x.astype(F64) if isinstance(x, jax.Array) else x, segment
    )
    segment.AREABSCR1.is_active = False
    segment.AREAMQZM1.k1 = jnp.asarray([4.5], F64)
    segment.AREAMQZM2.k1 = jnp.asarray([-7.0], F64)
    segment.AREAMQZM3.k1 = jnp.asarray([2.2], F64)
    segment.AREAMCVM1.angle = jnp.asarray([1.2e-3], F64)
    segment.AREAMCHM1.angle = jnp.asarray([-0.8e-3], F64)

    out = segment.track(particle_beam(cloud[None]))
    oracle = go.track_cloud(
        [_oracle_map_for(el) for el in segment.flattened().elements], cloud
    )
    assert_clouds_match(np.asarray(out.particles[0]), oracle, atol=1e-11)


def test_parameter_beam_moments_vs_oracle():
    """ParameterBeam mu/Sigma propagation (mu' = R mu, Sigma' = R Sigma R^T)
    against the oracle maps through a dipole-quad chain."""
    beam = lt.ParameterBeam.from_parameters(
        mu_x=jnp.asarray([1e-4], F64),
        mu_xp=jnp.asarray([-2e-5], F64),
        sigma_x=jnp.asarray([2e-4], F64),
        sigma_y=jnp.asarray([1.5e-4], F64),
        sigma_p=jnp.asarray([2e-3], F64),
        energy=jnp.asarray([ENERGY], F64),
        dtype=F64,
    )
    segment = lt.Segment(
        [
            lt.Dipole(
                length=jnp.asarray([0.4], F64),
                angle=jnp.asarray([0.15], F64),
                dtype=F64,
            ),
            lt.Drift(length=jnp.asarray([0.5], F64), dtype=F64),
            lt.Quadrupole(
                length=jnp.asarray([0.23], F64),
                k1=jnp.asarray([5.0], F64),
                dtype=F64,
            ),
        ]
    )
    out = segment.track(beam)

    R = np.eye(7)
    for m in [
        go.dipole_map(0.4, 0.15, ENERGY),
        go.drift_map(0.5, ENERGY),
        go.quadrupole_map(0.23, 5.0, ENERGY),
    ]:
        R = m @ R
    mu = np.asarray(beam._mu[0])
    cov = np.asarray(beam._cov[0])
    np.testing.assert_allclose(np.asarray(out._mu[0]), R @ mu, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(out._cov[0]), R @ cov @ R.T, rtol=1e-8, atol=1e-16
    )
