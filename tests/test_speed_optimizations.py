"""Optimization-pass tests (mirrors reference ``tests/test_speed_optimizations.py``)."""

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt

STATS = (
    "mu_x", "mu_xp", "mu_y", "mu_yp", "sigma_x", "sigma_xp",
    "sigma_y", "sigma_yp", "sigma_s", "sigma_p", "energy",
)


def _segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.6]), name="d1"),
            lt.Marker(name="m1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
            lt.Drift(length=jnp.array([0.4]), name="d2"),
            lt.HorizontalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([2e-4]), name="hc1"
            ),
            lt.Drift(length=jnp.array([0.3]), name="d3"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([0.0]), name="q2"),
            lt.Marker(name="m2"),
        ],
        name="seg",
    )


def _beam():
    return lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1.75e-4]),
        sigma_p=jnp.array([2e-3]),
        energy=jnp.array([1e8]),
    )


def test_merged_transfer_maps_preserve_stats():
    segment = _segment()
    beam = _beam()
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    out_plain = segment.track(beam)
    out_merged = merged.track(beam)
    for stat in STATS:
        np.testing.assert_allclose(
            np.asarray(getattr(out_merged, stat)),
            np.asarray(getattr(out_plain, stat)),
            rtol=1e-5,
            atol=1e-10,
            err_msg=stat,
        )


def test_merged_segment_has_single_element():
    segment = _segment()
    merged = segment.transfer_maps_merged(incoming_beam=_beam())
    assert len(merged.elements) == 1
    assert isinstance(merged.elements[0], lt.CustomTransferMap)


def test_merged_with_except_for_keeps_element_live():
    segment = _segment()
    merged = segment.transfer_maps_merged(incoming_beam=_beam(), except_for=["q1"])
    names = [el.name for el in merged.elements]
    assert "q1" in names
    assert len(merged.elements) == 3  # combined | q1 | combined
    # Re-tuning the kept element changes the tracked result.
    out_before = merged.track(_beam())
    merged.q1.k1 = jnp.array([-4.2])
    out_after = merged.track(_beam())
    assert not np.allclose(
        np.asarray(out_before.sigma_x), np.asarray(out_after.sigma_x)
    )


def test_merged_preserves_stats_broadcast():
    segment = _segment().broadcast((10,))
    beam = _beam().broadcast((10,))
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    out_plain = segment.track(beam)
    out_merged = merged.track(beam)
    for stat in STATS:
        np.testing.assert_allclose(
            np.asarray(getattr(out_merged, stat)),
            np.asarray(getattr(out_plain, stat)),
            rtol=1e-5,
            atol=1e-10,
            err_msg=stat,
        )


def test_without_inactive_markers():
    segment = _segment()
    no_markers = segment.without_inactive_markers()
    assert all(not isinstance(el, lt.Marker) for el in no_markers.elements)
    out_a = segment.track(_beam())
    out_b = no_markers.track(_beam())
    np.testing.assert_allclose(
        np.asarray(out_a.sigma_x), np.asarray(out_b.sigma_x), rtol=1e-6
    )


def test_without_inactive_markers_except_for():
    segment = _segment()
    kept = segment.without_inactive_markers(except_for=["m2"])
    names = [el.name for el in kept.elements]
    assert "m2" in names and "m1" not in names


def test_inactive_elements_as_drifts():
    segment = _segment()
    as_drifts = segment.inactive_elements_as_drifts()
    # q2 (k1=0) becomes a drift; q1 stays.
    assert isinstance(as_drifts.q2, lt.Drift)
    assert isinstance(as_drifts.q1, lt.Quadrupole)
    out_a = segment.track(_beam())
    out_b = as_drifts.track(_beam())
    np.testing.assert_allclose(
        np.asarray(out_a.sigma_x), np.asarray(out_b.sigma_x), rtol=1e-5
    )


def test_inactive_elements_as_drifts_except_for():
    segment = _segment()
    kept = segment.inactive_elements_as_drifts(except_for=["q2"])
    assert isinstance(kept.q2, lt.Quadrupole)


def test_without_inactive_zero_length_elements():
    segment = _segment()
    trimmed = segment.without_inactive_zero_length_elements()
    names = [el.name for el in trimmed.elements]
    assert "m1" not in names and "m2" not in names
    assert "d1" in names and "q1" in names


def test_merged_tracks_batched_energy_through_cavity():
    """SURVEY §7 hard part 3: merging downstream of an energy-changing
    cavity must use each batch entry's OWN entrance energy — mixed per-entry
    voltages make the downstream merged maps differ per entry."""
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.3]), name="d0"),
            lt.Cavity(
                length=jnp.array([1.0, 1.0]),
                voltage=jnp.array([0.0, 5e7]),  # off / strongly accelerating
                phase=jnp.array([0.0, 0.0]),
                frequency=jnp.array([1.3e9, 1.3e9]),
                name="cav",
            ),
            lt.Drift(length=jnp.array([0.5]), name="d1"),
            lt.Quadrupole(
                length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"
            ),
            lt.Drift(length=jnp.array([0.5]), name="d2"),
        ],
        name="seg_cav",
    ).broadcast((2,))
    beam = _beam().broadcast((2,))

    merged = segment.transfer_maps_merged(incoming_beam=beam)
    out_plain = segment.track(beam)
    out_merged = merged.track(beam)
    for stat in STATS:
        np.testing.assert_allclose(
            np.asarray(getattr(out_merged, stat)),
            np.asarray(getattr(out_plain, stat)),
            rtol=1e-5,
            atol=1e-10,
            err_msg=stat,
        )
    # The energy-dependent downstream map must actually differ per entry.
    custom_maps = [
        el for el in merged.elements if isinstance(el, lt.CustomTransferMap)
    ]
    downstream = custom_maps[-1]
    tm = np.asarray(downstream._transfer_map)
    assert tm.shape[0] == 2
    assert not np.allclose(tm[0], tm[1])
