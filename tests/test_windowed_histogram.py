"""Windowed MXU one-hot-matmul histogram (TPU fast path for screen reads).

Exactness contract: ``windowed_matmul_histogram_2d`` must match the scatter
path (``weighted_histogram_2d``, itself pinned against numpy.histogram2d in
``test_screen.py``) to f32 rounding — via the MXU kernel when the beam spot
fits the window and via the built-in fallback when it does not.  Runs in
Pallas interpreter mode on the CPU CI backend; reference semantics:
``/root/reference/lynx/accelerator/screen.py:143-216``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import lynx_tpu.ops.histogram as hist_mod
from lynx_tpu.ops.histogram import (
    weighted_histogram_2d,
    windowed_matmul_histogram_2d,
)

BINS = (612, 510)  # quarter-res ARES screen: big enough to exercise windowing


@pytest.fixture
def interpreted_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _spot(key, n, sigma_px, center, bins, ranges):
    """Gaussian spot in physical coordinates: sigma/center given in pixels."""
    (x_lo, x_hi), (y_lo, y_hi) = ranges
    px = (x_hi - x_lo) / bins[0]
    py = (y_hi - y_lo) / bins[1]
    kx, ky = jax.random.split(key)
    x = center[0] * px + x_lo + sigma_px * px * jax.random.normal(kx, (n,))
    y = center[1] * py + y_lo + sigma_px * py * jax.random.normal(ky, (n,))
    return x, y


RANGES = ((jnp.float32(-4.3e-3), jnp.float32(4.3e-3)),
          (jnp.float32(-2.5e-3), jnp.float32(2.5e-3)))


def test_matmul_path_matches_scatter(interpreted_pallas):
    x, y = _spot(jax.random.PRNGKey(0), 5_000, 20.0, (300.0, 250.0), BINS, RANGES)
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert float(out.sum()) == pytest.approx(5_000.0)


def test_fractional_weights_two_pass(interpreted_pallas):
    key = jax.random.PRNGKey(1)
    x, y = _spot(key, 3_000, 15.0, (100.0, 400.0), BINS, RANGES)
    w = jax.random.uniform(jax.random.fold_in(key, 7), (3_000,), minval=0.1)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7
    )


def test_bf16_exact_weights_single_pass(interpreted_pallas):
    key = jax.random.PRNGKey(2)
    x, y = _spot(key, 4_000, 25.0, (306.0, 255.0), BINS, RANGES)
    w = (jax.random.uniform(jax.random.fold_in(key, 3), (4_000,)) > 0.3).astype(
        jnp.float32
    )  # 0/1 survival-style mask
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(
        x, y, w, *RANGES, BINS, bf16_exact_weights=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_oversize_spot_falls_back_to_scatter(interpreted_pallas):
    key = jax.random.PRNGKey(3)
    kx, ky = jax.random.split(key)
    # Uniform across the whole image: cannot fit any 512-px window.
    x = jax.random.uniform(kx, (2_000,), minval=RANGES[0][0], maxval=RANGES[0][1])
    y = jax.random.uniform(ky, (2_000,), minval=RANGES[1][0], maxval=RANGES[1][1])
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_out_of_range_and_dead_particles_dropped(interpreted_pallas):
    x, y = _spot(jax.random.PRNGKey(4), 1_000, 10.0, (50.0, 60.0), BINS, RANGES)
    # Push some particles off-screen; kill some others.
    x = x.at[:100].set(RANGES[0][1] * 10)
    w = jnp.ones_like(x).at[100:200].set(0.0)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert float(out.sum()) == pytest.approx(800.0)


def test_batched_input(interpreted_pallas):
    key = jax.random.PRNGKey(5)
    xs, ys = [], []
    for i, center in enumerate([(100.0, 100.0), (500.0, 400.0), (306.0, 255.0),
                                (50.0, 450.0), (600.0, 60.0), (306.0, 400.0)]):
        x1, y1 = _spot(jax.random.fold_in(key, i), 500, 8.0, center, BINS, RANGES)
        xs.append(x1)
        ys.append(y1)
    x = jnp.stack(xs).reshape(2, 3, 500)
    y = jnp.stack(ys).reshape(2, 3, 500)
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    assert out.shape == (2, 3, *BINS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_rectangular_window_matches_scatter(interpreted_pallas):
    """A tall (128, 512) window with a spot that fits it vertically but
    would blow a square 128 window: the matmul path must still be exact."""
    key = jax.random.PRNGKey(8)
    kx, ky = jax.random.split(key)
    (x_lo, x_hi), (y_lo, y_hi) = RANGES
    px = (x_hi - x_lo) / BINS[0]
    py = (y_hi - y_lo) / BINS[1]
    # sigma 8 px in x, 40 px in y: span ~70 x 360 px.
    x = 300.0 * px + x_lo + 8.0 * px * jax.random.normal(kx, (4_000,))
    y = 250.0 * py + y_lo + 40.0 * py * jax.random.normal(ky, (4_000,))
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS, window=(128, 512))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert float(out.sum()) == pytest.approx(4_000.0)


def test_ares_flagship_spot_takes_matmul_branch(interpreted_pallas, monkeypatch):
    """The EA working-point spot (~210 x 800 px) must FIT the ARES screen's
    moment-derived histogram_window — i.e. actually exercise the MXU
    branch, not silently fall back to scatter (a square 512 window always
    fell back on the y-tails).  Proven by poisoning the scatter fallback:
    the reading stays correct, so the matmul branch produced it."""
    from __graft_entry__ import _flagship
    from lynx_tpu.functional import track

    segment, beam = _flagship(num_particles=20_000)
    window = segment.AREABSCR1.histogram_window
    assert window is not None and window[1] > window[0]  # tall EA spot
    monkeypatch.setattr(hist_mod, "SCREEN_MATMUL_PATH", True)
    _, diagnostics = track(segment, beam)
    expected = np.asarray(diagnostics["AREABSCR1"])

    poisoned = lambda *a, **k: jnp.zeros_like(weighted_histogram_2d(*a, **k))
    monkeypatch.setattr(hist_mod, "weighted_histogram_2d", poisoned)
    _, diagnostics = track(segment, beam)
    image = np.asarray(diagnostics["AREABSCR1"])
    assert image.sum() == pytest.approx(20_000.0)  # zeros ⇒ fallback was taken
    np.testing.assert_allclose(image, expected, atol=1e-6)


def test_weight_gradients_match_scatter(interpreted_pallas):
    """jax.grad w.r.t. weights flows through the windowed path (custom VJP:
    gather of the cotangent image) and matches the scatter path's autodiff
    gradient — screen images stay differentiable on TPU."""
    key = jax.random.PRNGKey(9)
    x, y = _spot(key, 2_000, 12.0, (306.0, 255.0), BINS, RANGES)
    w = jax.random.uniform(jax.random.fold_in(key, 1), (2_000,), minval=0.2)
    target_row = 250

    def loss(w, fn):
        img = fn(x, y, w, *RANGES, BINS)
        return jnp.sum(img[:, target_row] ** 2)

    g_windowed = jax.grad(lambda w: loss(w, windowed_matmul_histogram_2d))(w)
    g_scatter = jax.grad(lambda w: loss(w, weighted_histogram_2d))(w)
    assert np.all(np.isfinite(np.asarray(g_windowed)))
    assert float(jnp.abs(g_scatter).max()) > 0  # non-trivial gradient
    np.testing.assert_allclose(
        np.asarray(g_windowed), np.asarray(g_scatter), rtol=1e-6, atol=1e-8
    )


def test_small_image_shortcuts_to_scatter():
    # No Pallas needed: window >= image on both axes.
    x, y = _spot(jax.random.PRNGKey(6), 300, 5.0, (20.0, 30.0), (64, 64), RANGES)
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, (64, 64))
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, (64, 64))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_screen_reading_routes_through_windowed_path(interpreted_pallas, monkeypatch):
    """A full Screen reading on the forced-matmul path equals the scatter
    reading, including the camera flip and axis swap."""
    from lynx_tpu import ParticleBeam, Screen

    beam = ParticleBeam.from_parameters(
        num_particles=2_000,
        mu_x=jnp.array(1e-4),
        sigma_x=jnp.array(7e-5),
        sigma_y=jnp.array(5e-5),
        energy=jnp.array(1e8),
        key=jax.random.PRNGKey(7),
    )
    screen = Screen(
        resolution=(1224, 1020),
        pixel_size=(7.0976e-6, 5.0006e-6),
        misalignment=(0.0, 0.0),
        is_active=True,
    )
    screen.track(beam)

    monkeypatch.setattr(hist_mod, "SCREEN_MATMUL_PATH", False)
    ref = np.asarray(screen.reading)
    screen.cached_reading = None
    monkeypatch.setattr(hist_mod, "SCREEN_MATMUL_PATH", True)
    out = np.asarray(screen.reading)
    assert ref.shape == (1020, 1224)
    assert ref.sum() == pytest.approx(2_000.0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.slow
def test_user_level_vmap_folds_into_grid(interpreted_pallas):
    """jax.vmap over the windowed histogram must fold into the kernel's
    grid batch (custom_vmap rule) — vmapping the pallas_call directly adds
    a Mosaic-illegal block dim (the round-2 on-device lowering crash)."""
    B, n = 5, 2_000
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    xs, ys = [], []
    for i in range(B):
        x, y = _spot(keys[i], n, 15.0, (300.0 + 10 * i, 250.0), BINS, RANGES)
        xs.append(x)
        ys.append(y)
    x = jnp.stack(xs)
    y = jnp.stack(ys)
    w = jnp.ones((B, n))

    vmapped = jax.vmap(
        lambda x, y, w: windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    )(x, y, w)
    batched = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_vmap_of_grad_through_windowed(interpreted_pallas):
    """vmap(grad(image loss)) — the fwd pallas_call inside the custom_vjp
    gets vmapped too; the custom_vmap rule must cover it."""
    B, n = 3, 1_000
    key = jax.random.PRNGKey(4)
    x, y = _spot(key, B * n, 12.0, (280.0, 240.0), BINS, RANGES)
    x = x.reshape(B, n)
    y = y.reshape(B, n)
    w = jnp.ones((B, n))

    def loss(x, y, w):
        img = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
        return jnp.sum(img**2)

    g = jax.vmap(jax.grad(loss, argnums=2))(x, y, w)
    assert g.shape == (B, n)
    assert bool(jnp.any(g != 0)) and bool(jnp.all(jnp.isfinite(g)))


def test_binary_weights_count_kernel(interpreted_pallas):
    """binary_weights drops the weight stream (int8 count kernel): exact
    counts for 0/1 survival masks, matching the scatter path."""
    x, y = _spot(jax.random.PRNGKey(6), 4_000, 18.0, (310.0, 260.0), BINS, RANGES)
    w = (jax.random.uniform(jax.random.PRNGKey(7), (4_000,)) > 0.3).astype(
        jnp.float32
    )
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(
        x, y, w, *RANGES, BINS, binary_weights=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert float(out.sum()) == pytest.approx(float(w.sum()))


def test_fallback_counter_not_incremented_by_vmapped_fast_path(
    interpreted_pallas,
):
    """Under user-level vmap the routing ``lax.cond`` lowers to ``select``
    and BOTH branches execute — the fallback callback fires even for reads
    the MXU path served.  The counter must only count rows whose concrete
    ``fits`` was False (ADVICE r4)."""
    hist_mod.reset_histogram_fallback_count()
    B, n = 3, 1_000
    x, y = _spot(jax.random.PRNGKey(8), B * n, 12.0, (280.0, 240.0), BINS, RANGES)
    x = x.reshape(B, n)
    y = y.reshape(B, n)
    w = jnp.ones((B, n))
    out = jax.vmap(
        lambda x, y, w: windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    )(x, y, w)
    jax.effects_barrier()
    assert out.shape == (B, *BINS)
    assert hist_mod.histogram_fallback_count() == 0

    # A genuinely overflowing row IS counted (scalar serial read).
    kx, ky = jax.random.split(jax.random.PRNGKey(9))
    xu = jax.random.uniform(kx, (n,), minval=RANGES[0][0], maxval=RANGES[0][1])
    yu = jax.random.uniform(ky, (n,), minval=RANGES[1][0], maxval=RANGES[1][1])
    windowed_matmul_histogram_2d(xu, yu, jnp.ones_like(xu), *RANGES, BINS)
    jax.effects_barrier()
    assert hist_mod.histogram_fallback_count() == 1


def test_window_fits_whole_batch_reduction():
    """``per_row=False`` returns the scalar verdict that matches the
    all-or-nothing routing of one batched read: False when ANY row
    overflows, even though other rows individually fit (ADVICE r4)."""
    n = 1_000
    x_fit, y_fit = _spot(
        jax.random.PRNGKey(10), n, 12.0, (280.0, 240.0), BINS, RANGES
    )
    kx, ky = jax.random.split(jax.random.PRNGKey(11))
    x_over = jax.random.uniform(
        kx, (n,), minval=RANGES[0][0], maxval=RANGES[0][1]
    )
    y_over = jax.random.uniform(
        ky, (n,), minval=RANGES[1][0], maxval=RANGES[1][1]
    )
    x = jnp.stack([x_fit, x_over])
    y = jnp.stack([y_fit, y_over])
    w = jnp.ones_like(x)
    per_row = hist_mod.window_fits(x, y, w, *RANGES, BINS, (512, 512))
    assert per_row.shape == (2,)
    assert bool(per_row[0]) and not bool(per_row[1])
    whole = hist_mod.window_fits(
        x, y, w, *RANGES, BINS, (512, 512), per_row=False
    )
    assert whole.shape == ()
    assert not bool(whole)


def test_unrolled_placement_distinct_origins(interpreted_pallas):
    """Batched rows whose spots sit at DIFFERENT image positions (each
    fitting its own window): the unrolled per-row placement must put
    every window at its own origin, exactly matching the scatter path."""
    n = 2_000
    xa, ya = _spot(jax.random.PRNGKey(13), n, 10.0, (100.0, 100.0), BINS, RANGES)
    xb, yb = _spot(jax.random.PRNGKey(14), n, 10.0, (500.0, 400.0), BINS, RANGES)
    x = jnp.stack([xa, xb])
    y = jnp.stack([ya, yb])
    w = jnp.ones_like(x)
    window = (128, 128)
    assert bool(jnp.all(hist_mod.window_fits(x, y, w, *RANGES, BINS, window)))
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_vmapped_placement_above_unroll_cap(interpreted_pallas, monkeypatch):
    """Batches beyond _PLACE_UNROLL_MAX take the vmapped placement; the
    result must be identical."""
    monkeypatch.setattr(hist_mod, "_PLACE_UNROLL_MAX", 2)
    B, n = 3, 1_000
    x, y = _spot(jax.random.PRNGKey(12), B * n, 15.0, (300.0, 250.0), BINS, RANGES)
    x = x.reshape(B, n)
    y = y.reshape(B, n)
    w = jnp.ones((B, n))
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_batched_weight_gradients_match_scatter(interpreted_pallas):
    """The custom weight-VJP is placement-independent; pin it on the
    batched (unrolled-placement) path."""
    B, n = 2, 1_500
    x, y = _spot(jax.random.PRNGKey(15), B * n, 14.0, (320.0, 260.0), BINS, RANGES)
    x = x.reshape(B, n)
    y = y.reshape(B, n)
    w = jnp.ones((B, n))

    def loss_windowed(w):
        img = windowed_matmul_histogram_2d(x, y, w, *RANGES, BINS)
        return jnp.sum(img**2)

    def loss_scatter(w):
        img = weighted_histogram_2d(x, y, w, *RANGES, BINS)
        return jnp.sum(img**2)

    gw = jax.grad(loss_windowed)(w)
    gs = jax.grad(loss_scatter)(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gs), atol=1e-5)


def test_batch_dims_on_y_only(interpreted_pallas):
    """Drop-in contract with the scatter path: batch dims may arrive on
    x OR y (review r5 — deriving the batch from x alone crashed the
    y-only case; weights must broadcast to the x/y joint batch, exactly
    like the scatter)."""
    B, n = 2, 1_500
    xb, yb = _spot(jax.random.PRNGKey(16), B * n, 14.0, (300.0, 250.0), BINS, RANGES)
    xb = xb.reshape(B, n)
    yb = yb.reshape(B, n)
    ones = jnp.ones((B, n))

    ref = weighted_histogram_2d(xb[0], yb, ones, *RANGES, BINS)
    out = windowed_matmul_histogram_2d(xb[0], yb, ones, *RANGES, BINS)
    assert out.shape == (B, *BINS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # ... and unbatched weights against a batched read broadcast fine.
    out2 = windowed_matmul_histogram_2d(
        xb[0], yb, jnp.ones((n,)), *RANGES, BINS
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-6)


def test_screen_histogram_routes_by_platform(monkeypatch):
    """screen_histogram_2d must resolve its path like the rest of the
    package (review r5): platform='cpu' never enters the Pallas kernel
    even if the windowed path would otherwise be selected."""
    monkeypatch.setattr(hist_mod, "SCREEN_MATMUL_PATH", None)

    def forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("pallas entered on the cpu route")

    import lynx_tpu.ops.histogram as h

    x, y = _spot(jax.random.PRNGKey(17), 1_000, 10.0, (300.0, 250.0), BINS, RANGES)
    w = jnp.ones_like(x)
    ref = weighted_histogram_2d(x, y, w, *RANGES, BINS)
    monkeypatch.setattr(
        h, "windowed_matmul_histogram_2d", forbidden
    )
    out = h.screen_histogram_2d(x, y, w, RANGES[0], RANGES[1], BINS,
                                platform="cpu")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
