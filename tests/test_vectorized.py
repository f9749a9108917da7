"""Vectorization / shape contract (SURVEY.md §4 category 3; mirrors
reference ``tests/test_vectorized.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt


def _segment_batched(k1):
    return lt.Segment(
        [
            lt.Drift(length=jnp.full_like(k1, 0.5)),
            lt.Quadrupole(length=jnp.full_like(k1, 0.23), k1=k1, name="q"),
            lt.Drift(length=jnp.full_like(k1, 0.5)),
        ]
    )


@pytest.mark.parametrize("shape", [(2,), (3, 2)])
@pytest.mark.parametrize("BeamCls", [lt.ParameterBeam, lt.ParticleBeam])
def test_batched_elements_propagate_shapes(shape, BeamCls):
    k1 = jnp.linspace(1.0, 4.0, int(np.prod(shape))).reshape(shape)
    segment = _segment_batched(k1)
    kwargs = {"num_particles": 1000} if BeamCls is lt.ParticleBeam else {}
    beam = BeamCls.from_parameters(
        sigma_x=jnp.full(shape, 1e-4), energy=jnp.full(shape, 1e8), **kwargs
    )
    outgoing = segment.track(beam)
    assert outgoing.sigma_x.shape == shape
    assert outgoing.energy.shape == shape


def test_broadcast_then_track_equals_unbatched():
    """Every batch entry of a broadcast beam/segment must equal the unbatched
    result (reference ``test_vectorized.py:324-366``)."""
    segment = _segment_batched(jnp.array([3.0]))
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), energy=jnp.array([1e8])
    )
    single = segment.track(beam)

    broadcast_segment = segment.broadcast((5,))
    broadcast_beam = beam.broadcast((5,))
    batched = broadcast_segment.track(broadcast_beam)

    assert batched.sigma_x.shape == (5,)
    for i in range(5):
        np.testing.assert_allclose(
            float(batched.sigma_x[i]), float(single.sigma_x[0]), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(batched.mu_x[i]), float(single.mu_x[0]), rtol=1e-6, atol=1e-12
        )


def test_vmap_over_magnet_settings_equals_batched():
    """vmap over a setting axis is the idiomatic replacement for broadcast;
    both paths must agree."""
    k1s = jnp.linspace(-5.0, 5.0, 7)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array(1e-4), energy=jnp.array(1e8)
    )

    def track_one(k1):
        segment = lt.Segment(
            [
                lt.Drift(length=jnp.array(0.5)),
                lt.Quadrupole(length=jnp.array(0.23), k1=k1),
                lt.Drift(length=jnp.array(0.5)),
            ]
        )
        return segment.track(beam).sigma_x

    vmapped = jax.vmap(track_one)(k1s)
    batched_segment = _segment_batched(k1s)
    batched_beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((7,), 1e-4), energy=jnp.full((7,), 1e8)
    )
    batched = batched_segment.track(batched_beam).sigma_x
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(batched), rtol=1e-6)


def test_large_settings_sweep_ares():
    """A (3, 1000)-setting sweep over the ARES EA runs in one track
    (scaled-down analog of reference ``test_vectorized.py:298-321``)."""
    from lynx_tpu.models import ares_ea_segment

    segment = ares_ea_segment().broadcast((3, 1000))
    segment.AREAMQZM1.k1 = jnp.broadcast_to(
        jnp.linspace(-10, 10, 1000)[None], (3, 1000)
    )
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((3, 1000), 1e-4), energy=jnp.full((3, 1000), 1.07e8)
    )
    outgoing = segment.track(beam)
    assert outgoing is lt.Beam.empty or outgoing.sigma_x.shape == (3, 1000)


def test_mixed_active_cavity_batch_tracks():
    """Mixed zero/non-zero cavity voltages in one batch must not error
    (reference ``test_vectorized.py:423-439``)."""
    segment = lt.Segment(
        [
            lt.Cavity(
                length=jnp.array([3.0441, 3.0441]),
                voltage=jnp.array([0.0, 48198468.0]),
                phase=jnp.array([48.8577, 48.8577]),
                frequency=jnp.array([2.8560e9, 2.8560e9]),
                name="my_cavity",
            ),
            lt.Drift(length=jnp.array([0.5, 0.5])),
        ]
    )
    beam = lt.ParameterBeam.from_parameters(
        energy=jnp.array([8e7, 8e7]), sigma_x=jnp.array([1e-5, 1e-5])
    )
    outgoing = segment.track(beam)
    assert bool(jnp.all(jnp.isfinite(outgoing._mu)))
    assert bool(jnp.all(jnp.isfinite(outgoing._cov)))


def test_beam_broadcast_shapes():
    particle = lt.ParticleBeam.from_parameters(
        num_particles=100, sigma_x=jnp.array([1e-4])
    ).broadcast((4,))
    assert particle.particles.shape == (4, 100, 7)
    assert particle.energy.shape == (4,)
    parameter = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4])
    ).broadcast((4,))
    assert parameter._mu.shape == (4, 7)
    assert parameter._cov.shape == (4, 7, 7)
