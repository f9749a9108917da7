"""Cavity physics: golden Bmad/Tao cross-check and vectorization contracts.

The golden twiss numbers come from an independent Bmad/Tao run documented in
the reference suite (``tests/test_compare_ocelot.py:627-704``): an lcavity
with rf_frequency=1.3 GHz, L=1.0377 m, V=18.15975 MV, phi0=0 at E0=6 MeV.
"""

import jax
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt

TWISS_IN = dict(
    beta_x=5.91253677,
    alpha_x=3.55631308,
    beta_y=5.91253677,
    alpha_y=3.55631308,
    emittance_x=3.494768647122823e-09,
    emittance_y=3.497810737006068e-09,
)
BMAD_OUT = dict(
    beta_x=0.23847352510683092,
    beta_y=0.23847352512430994,
    alpha_x=-1.0160687592932345,
    alpha_y=-1.0160687593664295,
)


def _golden_cavity(dtype=jnp.float64):
    return lt.Cavity(
        length=jnp.array([1.0377], dtype=dtype),
        voltage=jnp.array([0.01815975e9], dtype=dtype),
        frequency=jnp.array([1.3e9], dtype=dtype),
        phase=jnp.array([0.0], dtype=dtype),
        dtype=dtype,
    )


def test_cavity_bmad_golden_twiss_parameter_beam():
    beam = lt.ParameterBeam.from_twiss(
        beta_x=jnp.array([TWISS_IN["beta_x"]], dtype=jnp.float64),
        alpha_x=jnp.array([TWISS_IN["alpha_x"]], dtype=jnp.float64),
        emittance_x=jnp.array([TWISS_IN["emittance_x"]], dtype=jnp.float64),
        beta_y=jnp.array([TWISS_IN["beta_y"]], dtype=jnp.float64),
        alpha_y=jnp.array([TWISS_IN["alpha_y"]], dtype=jnp.float64),
        emittance_y=jnp.array([TWISS_IN["emittance_y"]], dtype=jnp.float64),
        energy=jnp.array([6e6], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    outgoing = _golden_cavity().track(beam)

    assert np.isclose(float(outgoing.beta_x[0]), BMAD_OUT["beta_x"], rtol=1e-6)
    assert np.isclose(float(outgoing.alpha_x[0]), BMAD_OUT["alpha_x"], rtol=1e-6)
    assert np.isclose(float(outgoing.beta_y[0]), BMAD_OUT["beta_y"], rtol=1e-6)
    assert np.isclose(float(outgoing.alpha_y[0]), BMAD_OUT["alpha_y"], rtol=1e-6)
    # Energy gain: E + V cos(phi)
    assert np.isclose(float(outgoing.energy[0]), 6e6 + 0.01815975e9)


def test_cavity_bmad_golden_twiss_particle_beam():
    beam = lt.ParticleBeam.from_twiss(
        num_particles=200_000,
        beta_x=jnp.array([TWISS_IN["beta_x"]], dtype=jnp.float64),
        alpha_x=jnp.array([TWISS_IN["alpha_x"]], dtype=jnp.float64),
        emittance_x=jnp.array([TWISS_IN["emittance_x"]], dtype=jnp.float64),
        beta_y=jnp.array([TWISS_IN["beta_y"]], dtype=jnp.float64),
        alpha_y=jnp.array([TWISS_IN["alpha_y"]], dtype=jnp.float64),
        emittance_y=jnp.array([TWISS_IN["emittance_y"]], dtype=jnp.float64),
        energy=jnp.array([6e6], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    outgoing = _golden_cavity().track(beam)
    # Sample moments: statistical tolerance.
    assert np.isclose(float(outgoing.beta_x[0]), BMAD_OUT["beta_x"], rtol=2e-2)
    assert np.isclose(float(outgoing.alpha_x[0]), BMAD_OUT["alpha_x"], rtol=2e-2)


def test_cavity_inactive_equals_drift_transverse():
    """A cavity with V=0 must behave like a drift (skippable branch)."""
    cavity = lt.Cavity(length=jnp.array([1.0377]), name="c")
    drift = lt.Drift(length=jnp.array([1.0377]))
    beam = lt.ParameterBeam.from_parameters(energy=jnp.array([6e6]))
    out_c = cavity.track(beam)
    out_d = drift.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_c._mu), np.asarray(out_d._mu), rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_c._cov), np.asarray(out_d._cov), rtol=1e-5, atol=1e-20
    )


def test_cavity_mixed_voltage_batch_no_nan():
    """Mixed on/off voltages in one batch must not produce NaNs (contract
    from reference ``tests/test_vectorized.py:423-439``)."""
    cavity = lt.Cavity(
        length=jnp.array([1.0377, 1.0377]),
        voltage=jnp.array([0.0, 48198468.0]),
        phase=jnp.array([48.8577, 48.8577]),
        frequency=jnp.array([2.8560e9, 2.8560e9]),
        name="my_cavity",
    )
    for BeamCls in (lt.ParameterBeam, lt.ParticleBeam):
        kwargs = {"num_particles": 1000} if BeamCls is lt.ParticleBeam else {}
        beam = BeamCls.from_parameters(
            energy=jnp.array([1e8, 1e8]), sigma_x=jnp.array([1e-5, 1e-5]), **kwargs
        )
        outgoing = cavity.track(beam)
        for leaf in [outgoing.mu_x, outgoing.sigma_x, outgoing.energy]:
            assert bool(jnp.all(jnp.isfinite(leaf)))
        # Off entry keeps its energy, on entry gains V cos(phi).
        assert float(outgoing.energy[0]) == 1e8
        assert float(outgoing.energy[1]) > 1e8


def test_cavity_zero_crossing_phase_no_nan():
    """phi=90 deg (pure chirp, zero net acceleration) must stay finite.
    The reference NaNs here; lynx-tpu implements the analytic limit."""
    cavity = lt.Cavity(
        length=jnp.array([1.0]),
        voltage=jnp.array([2e7]),
        phase=jnp.array([90.0]),
        frequency=jnp.array([1.3e9]),
    )
    beam = lt.ParameterBeam.from_parameters(energy=jnp.array([1e8]))
    outgoing = cavity.track(beam)
    assert bool(jnp.all(jnp.isfinite(outgoing._mu)))
    assert bool(jnp.all(jnp.isfinite(outgoing._cov)))
    # Chirp term r65 is nonzero at the zero crossing.
    tm = cavity.transfer_map(beam.energy)
    assert abs(float(tm[0, 5, 4])) > 0


def test_cavity_energy_update_propagates_downstream():
    """Downstream transfer maps must see the boosted energy."""
    segment = lt.Segment(
        [
            lt.Cavity(
                length=jnp.array([1.0377]),
                voltage=jnp.array([0.01815975e9]),
                frequency=jnp.array([1.3e9]),
                phase=jnp.array([0.0]),
                name="c1",
            ),
            lt.Drift(length=jnp.array([1.0]), name="d1"),
        ]
    )
    beam = lt.ParameterBeam.from_parameters(energy=jnp.array([6e6]))
    outgoing = segment.track(beam)
    assert np.isclose(float(outgoing.energy[0]), 6e6 + 0.01815975e9)


def test_cavity_non_zero_phase_energy_gain_and_beam_type_consistency():
    """Nonzero-phase cavity (reference ``test_compare_ocelot.py:706-``,
    re-anchored to physics invariants instead of a live Ocelot run):
    the reference-energy gain is V*cos(phase_deg) exactly, and both beam
    representations agree on all transverse moments."""
    import lynx_tpu as lt

    phase_deg = 30.0
    voltage = 18159750.0
    cavity = lt.Cavity(
        length=jnp.array([1.0377]),
        voltage=jnp.array([voltage]),
        phase=jnp.array([phase_deg]),
        frequency=jnp.array([1.3e9]),
    )
    params = dict(
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        sigma_s=jnp.array([8e-6]),
        sigma_p=jnp.array([2e-3]),
        energy=jnp.array([6e6]),
    )
    parameter = lt.ParameterBeam.from_parameters(**params)
    particle = lt.ParticleBeam.from_parameters(
        num_particles=200_000, key=jax.random.PRNGKey(11), **params
    )
    out_param = cavity.track(parameter)
    out_particle = cavity.track(particle)

    expected_energy = 6e6 + voltage * np.cos(np.deg2rad(phase_deg))
    np.testing.assert_allclose(
        float(out_param.energy[0]), expected_energy, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out_particle.energy[0]), expected_energy, rtol=1e-6
    )
    for stat in ("mu_x", "sigma_x", "mu_y", "sigma_y", "sigma_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_param, stat)),
            np.asarray(getattr(out_particle, stat)),
            rtol=1e-2,
            atol=1e-6,
            err_msg=stat,
        )
    # Off-crest phase shifts the energy less than on-crest.
    on_crest = lt.Cavity(
        length=jnp.array([1.0377]),
        voltage=jnp.array([voltage]),
        phase=jnp.array([0.0]),
        frequency=jnp.array([1.3e9]),
    ).track(parameter)
    assert float(on_crest.energy[0]) > float(out_param.energy[0])
