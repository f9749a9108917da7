"""Traced stateful-diagnostics deviation (docs/deviations.md §8).

The reference's OO contract stores readings on every active-screen/BPM
track (``lynx/accelerator/screen.py:126-141``, ``bpm.py:48-58``); under
jit that side effect cannot exist.  The deviation must be LOUD: a warning
at trace time pointing at ``functional.track``, never silently-zero
readings (VERDICT r3 missing #3)."""

import warnings

import jax
import jax.numpy as jnp
import pytest

import lynx_tpu as lt
from lynx_tpu.functional import track


def _beam(n=200):
    return lt.ParticleBeam.from_parameters(
        num_particles=n,
        sigma_x=jnp.array([2e-4]),
        sigma_y=jnp.array([2e-4]),
        energy=jnp.array([1e8]),
        key=jax.random.PRNGKey(0),
    )


def _segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.3])),
            lt.BPM(name="B1", is_active=True),
            lt.Screen(
                name="S1",
                is_active=True,
                resolution=(64, 48),
                pixel_size=jnp.array([1e-4, 1e-4]),
            ),
        ]
    )


def test_traced_screen_track_warns_and_points_at_functional():
    segment = _segment()
    beam = _beam()

    def jitted(b):
        segment.track(b)  # absorbs the beam (returns the empty sentinel)
        return jnp.zeros(())

    with pytest.warns(UserWarning, match="functional.track") as record:
        jax.jit(jitted)(beam)
    messages = [str(w.message) for w in record]
    assert any("Screen 'S1'" in m for m in messages)
    assert any("BPM 'B1'" in m for m in messages)
    # The stateful reading was NOT updated (stays the pre-track zeros).
    assert float(segment.S1.reading.sum()) == 0.0


def test_eager_track_stores_reading_without_warning():
    segment = _segment()
    beam = _beam()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        segment.track(beam)
    assert float(segment.S1.reading.sum()) > 0.0
    assert jnp.all(jnp.isfinite(segment.B1.reading))


def test_functional_track_is_the_supported_traced_route():
    segment = _segment()
    beam = _beam()
    _, diagnostics = jax.jit(lambda b: track(segment, b))(beam)
    assert float(diagnostics["S1"].sum()) > 0.0
    assert jnp.all(jnp.isfinite(diagnostics["B1"]))


def test_inactive_elements_do_not_warn_under_jit():
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.3])),
            lt.BPM(name="B1", is_active=False),
            lt.Screen(name="S1", is_active=False),
        ]
    )
    beam = _beam()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        jax.jit(segment.track)(beam)  # all inactive: beam passes through
