"""LatticeJSON save/load roundtrip (mirrors reference ``tests/test_lattice_json.py``)."""

import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt


def _segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.6]), name="d1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
            lt.Dipole(length=jnp.array([0.3]), angle=jnp.array([0.1]), name="b1"),
            lt.Cavity(
                length=jnp.array([1.0]),
                voltage=jnp.array([1e7]),
                frequency=jnp.array([1.3e9]),
                name="c1",
            ),
            lt.Screen(name="s1"),
            lt.BPM(name="bpm1"),
            lt.Marker(name="m1"),
            lt.Aperture(
                x_max=jnp.array([1e-3]), y_max=jnp.array([1e-3]), name="a1"
            ),
            lt.HorizontalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([1e-4]), name="h1"
            ),
            lt.VerticalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([1e-4]), name="v1"
            ),
            lt.Solenoid(length=jnp.array([0.2]), k=jnp.array([1.0]), name="sol1"),
            lt.Undulator(length=jnp.array([0.5]), name="u1"),
        ],
        name="roundtrip_test",
    )


def test_save_reload_roundtrip(tmp_path):
    segment = _segment()
    path = str(tmp_path / "lattice.json")
    segment.to_lattice_json(path)
    reloaded = lt.Segment.from_lattice_json(path)

    assert reloaded.name == segment.name
    assert len(reloaded.elements) == len(segment.elements)
    for original, loaded in zip(segment.elements, reloaded.elements):
        assert type(original) is type(loaded)
        assert original.name == loaded.name
    np.testing.assert_allclose(
        np.asarray(reloaded.length), np.asarray(segment.length), rtol=1e-6
    )


def test_roundtrip_preserves_tracking(tmp_path):
    segment = _segment()
    path = str(tmp_path / "lattice.json")
    segment.to_lattice_json(path)
    reloaded = lt.Segment.from_lattice_json(path)
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), energy=jnp.array([1e8])
    )
    out_a = segment.track(beam)
    out_b = reloaded.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_a.sigma_x), np.asarray(out_b.sigma_x), rtol=1e-6
    )


def test_version_tag_is_cheetah_compatible(tmp_path):
    import json

    segment = _segment()
    path = str(tmp_path / "lattice.json")
    segment.to_lattice_json(path)
    with open(path) as f:
        data = json.load(f)
    assert data["version"] == "cheetah-0.6"
    assert data["root"] == "roundtrip_test"
    assert "elements" in data and "lattices" in data


def test_nested_segment_roundtrip(tmp_path):
    inner = lt.Segment(
        [lt.Drift(length=jnp.array([0.1]), name="din")], name="inner"
    )
    outer = lt.Segment(
        [lt.Drift(length=jnp.array([0.2]), name="dout"), inner], name="outer"
    )
    path = str(tmp_path / "nested.json")
    outer.to_lattice_json(path)
    reloaded = lt.Segment.from_lattice_json(path)
    assert isinstance(reloaded.elements[1], lt.Segment)
    assert reloaded.elements[1].elements[0].name == "din"


def test_random_lattice_roundtrip_fuzz(tmp_path):
    """Randomized lattices survive the JSON roundtrip: identical defining
    features and identical tracking for every seed."""
    from tests.test_random_lattices import BEAM_PARAMS, _random_segment

    for seed in range(6):
        segment = _random_segment(seed, n_elements=8)
        path = str(tmp_path / f"fuzz_{seed}.json")
        segment.to_lattice_json(path)
        reloaded = lt.Segment.from_lattice_json(path)

        for orig, back in zip(segment.elements, reloaded.elements):
            assert type(orig) is type(back), (seed, orig.name)
            assert orig.name == back.name
            for feature in orig.defining_features:
                a, b = getattr(orig, feature), getattr(back, feature)
                np.testing.assert_allclose(
                    np.asarray(a, dtype=np.float64),
                    np.asarray(b, dtype=np.float64),
                    rtol=1e-6,
                    err_msg=f"seed {seed}: {orig.name}.{feature}",
                )

        beam = lt.ParameterBeam.from_parameters(**BEAM_PARAMS)
        out_a = segment.track(beam)
        out_b = reloaded.track(beam)
        for stat in ("mu_x", "sigma_x", "mu_y", "sigma_y", "sigma_p"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_a, stat)),
                np.asarray(getattr(out_b, stat)),
                rtol=1e-6,
                err_msg=f"seed {seed}: {stat}",
            )


def test_load_inside_jit(tmp_path):
    """Loading a lattice inside a jitted function must trace: static screen
    configuration (resolution/binning) has to stay host-side instead of
    becoming traced constants (regression: ``_PackedParams.get`` converted
    host keys with ``jnp.asarray``, breaking ``Screen.__init__`` under jit)."""
    import jax

    segment = _segment()
    path = str(tmp_path / "lattice.json")
    segment.to_lattice_json(path)

    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1.75e-4]), energy=jnp.array([1e8])
    )

    @jax.jit
    def tracked_sigma(mu):
        reloaded = lt.Segment.from_lattice_json(path)
        out, _ = lt.functional.track(reloaded, lt.ParameterBeam(mu, beam._cov, beam.energy))
        return out.sigma_x

    eager = lt.functional.track(lt.Segment.from_lattice_json(path), beam)[0].sigma_x
    np.testing.assert_allclose(
        np.asarray(tracked_sigma(beam._mu)), np.asarray(eager), rtol=1e-6
    )
