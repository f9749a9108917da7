"""Orbax checkpoint/restore of framework pytrees."""

import jax.numpy as jnp
import numpy as np
import optax

import lynx_tpu as lt
from lynx_tpu import checkpoint


def _segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5]), name="d1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
        ],
        name="ckpt_test",
    )


def test_segment_roundtrip(tmp_path):
    segment = _segment()
    checkpoint.save(tmp_path / "seg", segment)
    restored = checkpoint.restore(tmp_path / "seg", _segment())
    assert isinstance(restored, lt.Segment)
    assert restored.q1.name == "q1"
    np.testing.assert_allclose(
        np.asarray(restored.q1.k1), np.asarray(segment.q1.k1)
    )
    # Restored lattice tracks identically.
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), energy=jnp.array([1e8])
    )
    np.testing.assert_allclose(
        np.asarray(restored.track(beam).sigma_x),
        np.asarray(segment.track(beam).sigma_x),
    )


def test_training_state_roundtrip(tmp_path):
    segment = _segment()
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(segment)
    state = {"segment": segment, "opt_state": opt_state, "step": jnp.array(7)}
    checkpoint.save(tmp_path / "train", state)

    template = {
        "segment": _segment(),
        "opt_state": optimizer.init(_segment()),
        "step": jnp.array(0),
    }
    restored = checkpoint.restore(tmp_path / "train", template)
    assert int(restored["step"]) == 7
    np.testing.assert_allclose(
        np.asarray(restored["segment"].q1.k1), np.asarray(segment.q1.k1)
    )


def test_beam_roundtrip(tmp_path):
    beam = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([1e-4])
    )
    checkpoint.save(tmp_path / "beam", beam)
    template = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([2e-4])
    )
    restored = checkpoint.restore(tmp_path / "beam", template)
    np.testing.assert_allclose(
        np.asarray(restored.particles), np.asarray(beam.particles)
    )
