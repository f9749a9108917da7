"""Histogram-window auto-sizing + fallback instrumentation (VERDICT r3
next #7): the ARES flagship must stay off the 4x scatter cliff without a
hand-tuned window constant, and fallbacks must be observable."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import lynx_tpu as lt
from lynx_tpu.functional import track
from lynx_tpu.models import ares_ea_segment
from lynx_tpu.ops import histogram as hist


@pytest.fixture
def interpreted_pallas(monkeypatch):
    # histogram.py imports pallas inside its functions: patch the global.
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(hist, "SCREEN_MATMUL_PATH", True)


@pytest.fixture(autouse=True)
def reset_counter():
    hist.reset_histogram_fallback_count()
    yield
    hist.reset_histogram_fallback_count()


def test_ares_ea_window_is_derived_not_hardcoded():
    segment = ares_ea_segment()
    window = segment.AREABSCR1.histogram_window
    assert window is not None and window != (256, 1024)
    # Override and disable paths still work.
    assert ares_ea_segment(histogram_window=(64, 64)).AREABSCR1.histogram_window == (64, 64)
    assert ares_ea_segment(histogram_window=None).AREABSCR1.histogram_window is None


def test_derived_window_contains_the_flagship_spot():
    """The contract behind 'no 4x cliff': the reference speed-contract
    beam (tests/test_speed.py workload: 100k particles, flagship magnet
    settings) must land entirely inside the derived window."""
    import __graft_entry__ as graft

    segment, beam = graft._flagship(num_particles=100_000)
    window = segment.AREABSCR1.histogram_window
    pixel = np.asarray(segment.AREABSCR1.pixel_size)

    segment.AREABSCR1.is_active = False
    out, _ = track(segment, beam)
    xs, ys = np.asarray(out.xs), np.asarray(out.ys)
    extent_x = (xs.max() - xs.min()) / pixel[0]
    extent_y = (ys.max() - ys.min()) / pixel[1]
    assert extent_x < window[0], (extent_x, window)
    assert extent_y < window[1], (extent_y, window)
    # ...with a real margin (max-sample fluctuation is ~0.3 sigma).
    assert extent_x * 1.05 < window[0]
    assert extent_y * 1.05 < window[1]

    # The router's own verdict agrees (pure audit, works on any backend —
    # the axon TPU plugin cannot lower the callback counter).  Arguments
    # replicate screen_reading_particle's camera-orientation call exactly.
    half_w = 2448 * pixel[0] / 2
    half_h = 2040 * pixel[1] / 2
    fits = hist.window_fits(
        -out.ys,
        out.xs,
        jnp.ones_like(out.xs),
        (-half_h, half_h),
        (-half_w, half_w),
        (2040, 2448),
        (window[1], window[0]),
    )
    assert bool(np.all(np.asarray(fits)))


def test_derive_histogram_window_math():
    screen = lt.Screen(
        resolution=(1000, 800), pixel_size=jnp.array([1e-5, 2e-5])
    )
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-3]),  # 100 px
        sigma_y=jnp.array([1e-3]),  # 50 px
        energy=jnp.array([1e8]),
    )
    wx, wy = screen.derive_histogram_window(beam, k_sigma=4.0)
    assert 800 <= wx <= 801  # 2 * 4 * 100 px (+f32 ceil)
    assert 400 <= wy <= 401  # 2 * 4 * 50 px
    # Clipped to the resolution for huge beams.
    wide = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1.0]), sigma_y=jnp.array([1.0]),
        energy=jnp.array([1e8]),
    )
    assert screen.derive_histogram_window(wide) == (1000, 800)


def _read(screen_window, spread, n=512):
    """Windowed screen read of a synthetic spot; returns the image."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n,)) * spread
    y = jax.random.normal(jax.random.PRNGKey(1), (n,)) * spread
    return hist.windowed_matmul_histogram_2d(
        x,
        y,
        jnp.ones((n,)),
        (jnp.float32(-1.0), jnp.float32(1.0)),
        (jnp.float32(-1.0), jnp.float32(1.0)),
        (64, 256),
        window=screen_window,
    )


def test_fallback_counter_counts_only_oversize_spots(interpreted_pallas):
    assert hist.histogram_fallback_count() == 0
    fitting = _read((8, 128), spread=0.01)  # tiny spot: windowed path
    jax.effects_barrier()
    assert hist.histogram_fallback_count() == 0
    oversize = _read((8, 128), spread=0.9)  # spot >> window: fallback
    jax.effects_barrier()
    assert hist.histogram_fallback_count() == 1
    # Both paths are exact: the fallback image equals the plain scatter.
    n = 512
    x = jax.random.normal(jax.random.PRNGKey(0), (n,)) * 0.9
    y = jax.random.normal(jax.random.PRNGKey(1), (n,)) * 0.9
    scatter = hist.weighted_histogram_2d(
        x, y, jnp.ones((n,)),
        (jnp.float32(-1.0), jnp.float32(1.0)),
        (jnp.float32(-1.0), jnp.float32(1.0)),
        (64, 256),
    )
    np.testing.assert_allclose(np.asarray(oversize), np.asarray(scatter))


def test_fallback_counter_works_under_jit(interpreted_pallas):
    fn = jax.jit(lambda: _read((8, 128), spread=0.9))
    fn()
    jax.effects_barrier()
    assert hist.histogram_fallback_count() >= 1


def test_window_fits_full_window_early_exit():
    """A window covering the whole image reports False: the router skips
    windowing entirely and takes the plain scatter (which IS the fast
    path there — a whole-image one-hot matmul would be far slower), so
    the audit must match that routing decision."""
    x = jnp.array([0.1, 0.9])
    y = jnp.array([0.2, 0.8])
    fits = hist.window_fits(
        x, y, jnp.ones((2,)), (0.0, 1.0), (0.0, 1.0), (64, 128), (64, 128)
    )
    assert not bool(np.any(np.asarray(fits)))
    assert not bool(
        hist.window_fits(
            x, y, jnp.ones((2,)), (0.0, 1.0), (0.0, 1.0), (64, 128),
            (64, 128), per_row=False,
        )
    )


def test_window_fits_ignores_dead_particles():
    """Zero-weight particles outside the window must not force a fallback."""
    x = jnp.array([0.5, 0.99])  # second particle far away...
    y = jnp.array([0.5, 0.99])
    w = jnp.array([1.0, 0.0])  # ...but dead
    fits = hist.window_fits(
        x, y, w, (0.0, 1.0), (0.0, 1.0), (1024, 1024), (8, 128)
    )
    assert bool(np.all(np.asarray(fits)))
