"""Per-element unit tests (SURVEY.md §4 category 4)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt


def _beam(**kwargs):
    return lt.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_x=jnp.array([2e-4]),
        sigma_y=jnp.array([2e-4]),
        sigma_xp=jnp.array([1e-4]),
        sigma_yp=jnp.array([1e-4]),
        energy=jnp.array([1e8]),
        **kwargs,
    )


def test_quadrupole_off_equals_drift():
    """An off quadrupole behaves exactly like a drift
    (reference ``test_quadrupole.py:6-22``)."""
    quadrupole = lt.Quadrupole(length=jnp.array([1.0]), k1=jnp.array([0.0]))
    drift = lt.Drift(length=jnp.array([1.0]))
    beam = _beam()
    out_q = quadrupole.track(beam)
    out_d = drift.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_q.particles), np.asarray(out_d.particles), rtol=1e-5, atol=1e-12
    )
    on = lt.Quadrupole(length=jnp.array([1.0]), k1=jnp.array([4.2]))
    out_on = on.track(beam)
    assert not np.allclose(
        np.asarray(out_on.sigma_x), np.asarray(out_d.sigma_x), rtol=1e-4
    )


def test_dipole_off_equals_drift():
    dipole = lt.Dipole(length=jnp.array([1.0]), angle=jnp.array([0.0]))
    drift = lt.Drift(length=jnp.array([1.0]))
    beam = _beam()
    np.testing.assert_allclose(
        np.asarray(dipole.track(beam).particles),
        np.asarray(drift.track(beam).particles),
        rtol=1e-5,
        atol=1e-12,
    )


def test_dipole_disperses_off_momentum_beam():
    """A sector bend maps its own reference orbit to itself; off-momentum
    particles are dispersed via R16 = dx/beta."""
    dipole = lt.Dipole(length=jnp.array([0.31]), angle=jnp.array([0.1]))
    on_momentum = _beam()
    off_momentum = lt.ParticleBeam(
        on_momentum.particles.at[..., 5].add(1e-3),
        on_momentum.energy,
        particle_charges=on_momentum.particle_charges,
    )
    out_on = dipole.track(on_momentum)
    out_off = dipole.track(off_momentum)
    # On-momentum centroid stays on the reference orbit...
    assert np.isclose(float(out_on.mu_x[0]), float(on_momentum.mu_x[0]), atol=1e-6)
    # ...while the off-momentum beam is dispersed measurably.
    assert abs(float(out_off.mu_x[0]) - float(off_momentum.mu_x[0])) > 1e-6


def test_quadrupole_tilt_pi_symmetry():
    """A tilt of pi/4 and 5pi/4 produce the same transfer map (quad has
    180-degree symmetry; reference ``test_quadrupole.py:77-98``)."""
    beam = _beam()
    out1 = lt.Quadrupole(
        length=jnp.array([0.5]), k1=jnp.array([4.2]), tilt=jnp.array([jnp.pi / 4])
    ).track(beam)
    out2 = lt.Quadrupole(
        length=jnp.array([0.5]), k1=jnp.array([4.2]), tilt=jnp.array([5 * jnp.pi / 4])
    ).track(beam)
    np.testing.assert_allclose(
        np.asarray(out1.particles), np.asarray(out2.particles), rtol=1e-4, atol=1e-9
    )


def test_quadrupole_misalignment_shifts_kick():
    """A misaligned quad kicks a centered beam off axis."""
    beam = _beam()
    centered = lt.Quadrupole(length=jnp.array([0.5]), k1=jnp.array([4.2]))
    misaligned = lt.Quadrupole(
        length=jnp.array([0.5]),
        k1=jnp.array([4.2]),
        misalignment=jnp.array([[2e-4, -1e-4]]),
    )
    out_c = centered.track(beam)
    out_m = misaligned.track(beam)
    assert abs(float(out_m.mu_x[0]) - float(out_c.mu_x[0])) > 1e-6


def test_drift_grows_sigma_with_divergence():
    """A drift grows the beam size of a divergent beam
    (reference ``test_drift.py:7-36``)."""
    drift = lt.Drift(length=jnp.array([2.0]))
    beam = _beam()
    outgoing = drift.track(beam)
    assert float(outgoing.sigma_x[0]) > float(beam.sigma_x[0])
    assert float(outgoing.sigma_y[0]) > float(beam.sigma_y[0])
    # Energy unchanged
    assert float(outgoing.energy[0]) == float(beam.energy[0])


def test_correctors_kick_in_their_plane():
    beam = _beam()
    h = lt.HorizontalCorrector(length=jnp.array([0.1]), angle=jnp.array([1e-3]))
    v = lt.VerticalCorrector(length=jnp.array([0.1]), angle=jnp.array([1e-3]))
    out_h = h.track(beam)
    out_v = v.track(beam)
    assert np.isclose(
        float(out_h.mu_xp[0]), float(beam.mu_xp[0]) + 1e-3, atol=1e-7
    )
    assert np.isclose(float(out_h.mu_yp[0]), float(beam.mu_yp[0]), atol=1e-7)
    assert np.isclose(
        float(out_v.mu_yp[0]), float(beam.mu_yp[0]) + 1e-3, atol=1e-7
    )
    assert np.isclose(float(out_v.mu_xp[0]), float(beam.mu_xp[0]), atol=1e-7)


def test_solenoid_off_is_transverse_identity():
    sol = lt.Solenoid(length=jnp.array([0.5]), k=jnp.array([0.0]))
    beam = _beam()
    outgoing = sol.track(beam)
    # k=0: transverse block reduces to a drift
    drift_out = lt.Drift(length=jnp.array([0.5])).track(beam)
    np.testing.assert_allclose(
        np.asarray(outgoing.xs), np.asarray(drift_out.xs), rtol=1e-5, atol=1e-12
    )


def test_solenoid_couples_planes():
    sol = lt.Solenoid(length=jnp.array([0.5]), k=jnp.array([2.0]))
    beam = _beam(mu_x=jnp.array([1e-4]))
    outgoing = sol.track(beam)
    # Solenoid rotates x into y.
    assert abs(float(outgoing.mu_y[0])) > 1e-6


def test_undulator_behaves_like_drift_transversely():
    und = lt.Undulator(length=jnp.array([0.75]))
    drift = lt.Drift(length=jnp.array([0.75]))
    beam = _beam()
    np.testing.assert_allclose(
        np.asarray(und.track(beam).xs),
        np.asarray(drift.track(beam).xs),
        rtol=1e-6,
        atol=1e-12,
    )


def test_marker_is_noop():
    marker = lt.Marker()
    beam = _beam()
    assert marker.track(beam) is beam


def test_tracking_lengthless_elements_in_segment():
    """Zero-length elements track fine inside a segment
    (reference ``test_tracking_lengthless_elements.py``)."""
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([1.0])),
            lt.Marker(name="m"),
            lt.BPM(name="bpm", is_active=True),
            lt.Drift(length=jnp.array([1.0])),
        ]
    )
    outgoing = segment.track(_beam())
    assert outgoing is not lt.Beam.empty
    assert segment.bpm.reading is not None


def test_custom_transfer_map_applies_matrix():
    tm = jnp.eye(7).at[0, 1].set(0.3)[None]
    custom = lt.CustomTransferMap(tm)
    drift = lt.Drift(length=jnp.array([0.3]))
    beam = _beam()
    out_c = custom.track(beam)
    out_d = drift.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_c.xs), np.asarray(out_d.xs), rtol=1e-6, atol=1e-12
    )


def test_rbend_edge_angles():
    rbend = lt.RBend(length=jnp.array([0.5]), angle=jnp.array([0.2]))
    assert np.isclose(float(rbend.e1[0]), 0.1)
    assert np.isclose(float(rbend.e2[0]), 0.1)


def test_dipole_fringe_field_changes_map():
    plain = lt.Dipole(length=jnp.array([0.31]), angle=jnp.array([0.2]))
    fringed = lt.Dipole(
        length=jnp.array([0.31]),
        angle=jnp.array([0.2]),
        fringe_integral=jnp.array([0.5]),
        gap=jnp.array([0.05]),
        e1=jnp.array([0.1]),
    )
    energy = jnp.array([1e8])
    tm_plain = plain.transfer_map(energy)
    tm_fringed = fringed.transfer_map(energy)
    assert not np.allclose(np.asarray(tm_plain), np.asarray(tm_fringed))


def test_tracking_marker_only_segment():
    """Reference ``test_tracking_lengthless_elements.py:10-15``: a segment of
    only zero-length passthrough elements is an identity map."""
    beam = lt.ParticleBeam.from_parameters(
        num_particles=100, key=jax.random.PRNGKey(0)
    )
    out = lt.Segment([lt.Marker(name="start")]).track(beam)
    np.testing.assert_allclose(
        np.asarray(out.particles), np.asarray(beam.particles)
    )


def test_tracking_lengthless_between_nonskippable():
    """Reference ``test_tracking_lengthless_elements.py:18-28``: zero-length
    skippable runs sandwiched between non-skippable elements must not break
    run fusion."""
    beam = lt.ParticleBeam.from_parameters(
        num_particles=100, key=jax.random.PRNGKey(0)
    )
    segment = lt.Segment(
        [
            lt.Cavity(
                length=jnp.array([0.1]), voltage=jnp.array([1e6]), name="C2"
            ),
            lt.Marker(name="start"),
            lt.Cavity(
                length=jnp.array([0.1]), voltage=jnp.array([1e6]), name="C1"
            ),
        ]
    )
    out = segment.track(beam)
    assert out is not None
    assert bool(jnp.all(jnp.isfinite(out.particles)))
    assert float(out.energy[0]) > float(beam.energy[0])  # both cavities act


@pytest.mark.parametrize("is_active", [True, False])
@pytest.mark.parametrize("BeamCls", [lt.ParameterBeam, lt.ParticleBeam])
def test_bpm_active_inactive_by_beam_type(is_active, BeamCls):
    """Reference ``tests/test_bpm.py:7-22``: active BPMs record a reading
    for either beam type and pass the beam through unchanged; inactive BPMs
    record nothing."""
    if BeamCls is lt.ParticleBeam:
        beam = lt.ParticleBeam.from_parameters(
            num_particles=1_000,
            mu_x=jnp.array([3e-5]),
            sigma_x=jnp.array([1e-4]),
            energy=jnp.array([1e8]),
            key=jax.random.PRNGKey(5),
        )
    else:
        beam = lt.ParameterBeam.from_parameters(
            mu_x=jnp.array([3e-5]),
            sigma_x=jnp.array([1e-4]),
            energy=jnp.array([1e8]),
        )
    bpm = lt.BPM(name="bpm", is_active=is_active)
    segment = lt.Segment([lt.Drift(length=jnp.array([0.5])), bpm])
    outgoing = segment.track(beam)

    assert type(outgoing) is type(beam)
    # Through the 0.5 m drift the mean moves exactly linearly.
    expected_mu_x = np.asarray(beam.mu_x) + 0.5 * np.asarray(beam.mu_xp)
    np.testing.assert_allclose(
        np.asarray(outgoing.mu_x), expected_mu_x, rtol=1e-5, atol=1e-12
    )
    if is_active:
        reading = segment.bpm.reading
        assert reading is not None
        np.testing.assert_allclose(
            np.asarray(reading[0]), expected_mu_x, rtol=1e-5, atol=1e-12
        )
    else:
        assert segment.bpm.reading is None
