"""Randomized-lattice consistency fuzzing.

Property-based extension of the reference's fixed-lattice oracles
(``tests/test_compare_beam_type.py``): for seeded random element sequences
with random (physical) parameters, every execution path must tell the same
story —

* ParameterBeam moment propagation == ParticleBeam sample moments,
* per-entry batched tracking == unbatched tracking of each entry,
* the batch-last symbolic-table path == the batch-first matmul path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu.accelerator import segment as segment_mod

BEAM_PARAMS = dict(
    mu_x=jnp.array([1e-5]),
    mu_xp=jnp.array([2e-6]),
    mu_y=jnp.array([-2e-5]),
    mu_yp=jnp.array([-1e-6]),
    sigma_x=jnp.array([1.75e-4]),
    sigma_xp=jnp.array([2e-5]),
    sigma_y=jnp.array([1.75e-4]),
    sigma_yp=jnp.array([2e-5]),
    sigma_s=jnp.array([8e-6]),
    sigma_p=jnp.array([2e-3]),
    energy=jnp.array([1e8]),
)


def _random_element(rng: random.Random, index: int):
    """One random element with parameters in physically sane ranges."""
    kind = rng.choice(
        [
            "drift",
            "quad",
            "dipole",
            "hcor",
            "vcor",
            "solenoid",
            "undulator",
            "cavity",
            "marker",
        ]
    )
    name = f"{kind}_{index}"
    arr = lambda v: jnp.array([v])
    if kind == "drift":
        return lt.Drift(length=arr(rng.uniform(0.05, 1.0)), name=name)
    if kind == "quad":
        return lt.Quadrupole(
            length=arr(rng.uniform(0.05, 0.3)),
            k1=arr(rng.uniform(-30.0, 30.0)),
            tilt=arr(rng.uniform(-0.1, 0.1)),
            name=name,
        )
    if kind == "dipole":
        return lt.Dipole(
            length=arr(rng.uniform(0.1, 0.5)),
            angle=arr(rng.uniform(-0.1, 0.1)),
            e1=arr(rng.uniform(-0.02, 0.02)),
            e2=arr(rng.uniform(-0.02, 0.02)),
            name=name,
        )
    if kind == "hcor":
        return lt.HorizontalCorrector(
            length=arr(rng.uniform(0.01, 0.1)),
            angle=arr(rng.uniform(-5e-3, 5e-3)),
            name=name,
        )
    if kind == "vcor":
        return lt.VerticalCorrector(
            length=arr(rng.uniform(0.01, 0.1)),
            angle=arr(rng.uniform(-5e-3, 5e-3)),
            name=name,
        )
    if kind == "solenoid":
        return lt.Solenoid(
            length=arr(rng.uniform(0.1, 0.5)),
            k=arr(rng.uniform(0.0, 5.0)),
            name=name,
        )
    if kind == "undulator":
        return lt.Undulator(length=arr(rng.uniform(0.1, 0.5)), name=name)
    if kind == "cavity":
        return lt.Cavity(
            length=arr(rng.uniform(0.5, 1.5)),
            voltage=arr(rng.uniform(0.0, 2e6)),
            phase=arr(rng.uniform(-30.0, 30.0)),
            frequency=arr(2.998e9),
            name=name,
        )
    return lt.Marker(name=name)


def _random_segment(seed: int, n_elements: int = 8) -> lt.Segment:
    rng = random.Random(seed)
    return lt.Segment(
        [_random_element(rng, i) for i in range(n_elements)],
        name=f"fuzz_{seed}",
    )


@pytest.mark.parametrize("seed", range(6))
def test_beam_types_agree_on_random_lattices(seed):
    segment = _random_segment(seed)
    parameter = lt.ParameterBeam.from_parameters(**BEAM_PARAMS)
    particle = lt.ParticleBeam.from_parameters(
        num_particles=300_000, key=jax.random.PRNGKey(seed), **BEAM_PARAMS
    )
    out_param = segment.track(parameter)
    out_particle = segment.track(particle)
    for stat in ("mu_x", "mu_y", "sigma_x", "sigma_y", "sigma_s", "sigma_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_param, stat)),
            np.asarray(getattr(out_particle, stat)),
            rtol=2e-2,
            atol=1e-6,
            err_msg=f"seed {seed}: {stat}",
        )


def _broadcast_with_jitter(segment: lt.Segment, batch: int, seed: int):
    """(batch,)-broadcast the segment, jittering each tunable per entry."""
    key = jax.random.PRNGKey(seed)
    broadcast = segment.broadcast((batch,))
    for element in broadcast.elements:
        for field in ("k1", "angle", "k"):
            value = getattr(element, field, None)
            if value is None:
                continue
            key, sub = jax.random.split(key)
            scale = jnp.abs(value).max() + 1e-3
            setattr(
                element,
                field,
                value + 0.1 * scale * jax.random.normal(sub, value.shape),
            )
    return broadcast


@pytest.mark.parametrize("seed", range(4))
def test_batched_tracking_matches_per_entry(seed):
    batch = 4
    segment = _broadcast_with_jitter(_random_segment(seed), batch, seed)
    beam = lt.ParameterBeam.from_parameters(**BEAM_PARAMS).broadcast((batch,))
    out = segment.track(beam)
    for b in range(batch):
        single = lt.Segment(
            [
                jax.tree.map(lambda x: x[b][None], element)
                for element in segment.elements
            ],
            name="single",
        )
        ref = single.track(lt.ParameterBeam.from_parameters(**BEAM_PARAMS))
        for stat in ("mu_x", "mu_y", "sigma_x", "sigma_y", "sigma_p"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, stat))[b],
                np.asarray(getattr(ref, stat))[0],
                rtol=1e-9,
                atol=1e-14,
                err_msg=f"seed {seed} entry {b}: {stat}",
            )


@pytest.mark.parametrize("seed", range(4))
def test_table_path_matches_matmul_path(seed, monkeypatch):
    """The batch-last symbolic-table tier must reproduce the batch-first
    dense-matmul tier up to f32 roundoff (beams default to f32) on random
    lattices."""
    batch = 8
    segment = _broadcast_with_jitter(_random_segment(seed), batch, seed + 100)
    beam = lt.ParameterBeam.from_parameters(**BEAM_PARAMS).broadcast((batch,))

    monkeypatch.setattr(segment_mod, "BATCH_LAST_THRESHOLD", 10**9)
    dense = segment.track(beam)
    monkeypatch.setattr(segment_mod, "BATCH_LAST_THRESHOLD", 1)
    table = segment.track(beam)

    np.testing.assert_allclose(
        np.asarray(table._mu), np.asarray(dense._mu), rtol=1e-5, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(table._cov), np.asarray(dense._cov), rtol=1e-4, atol=1e-12
    )


@pytest.mark.parametrize("seed", range(4))
def test_particle_rows_path_matches_matmul_path(seed, monkeypatch):
    """The opt-in coordinate-row ParticleBeam table path must reproduce the
    dense matmul path (f32 roundoff)."""
    from lynx_tpu.accelerator import element as element_mod

    batch = 4
    segment = _broadcast_with_jitter(_random_segment(seed), batch, seed + 50)
    beam = lt.ParticleBeam.from_parameters(
        num_particles=512, key=jax.random.PRNGKey(seed), **BEAM_PARAMS
    ).broadcast((batch,))

    monkeypatch.setattr(segment_mod, "BATCH_LAST_THRESHOLD", 10**9)
    dense = segment.track(beam)
    monkeypatch.setattr(segment_mod, "BATCH_LAST_THRESHOLD", 1)
    monkeypatch.setattr(element_mod, "PARTICLE_ROWS_PATH", True)
    rows = segment.track(beam)

    np.testing.assert_allclose(
        np.asarray(rows.particles),
        np.asarray(dense.particles),
        rtol=1e-5,
        atol=1e-9,
    )


@pytest.mark.parametrize("seed", range(4))
def test_transfer_maps_merged_preserves_physics(seed):
    """``transfer_maps_merged`` must be physics-preserving on random
    lattices (reference ``test_speed_optimizations.py`` generalized)."""
    segment = _random_segment(seed, n_elements=10)
    beam = lt.ParameterBeam.from_parameters(**BEAM_PARAMS)
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    assert len(merged.elements) <= len(segment.elements)

    out_ref = segment.track(beam)
    out_merged = merged.track(beam)
    for stat in ("mu_x", "mu_y", "sigma_x", "sigma_y", "sigma_s", "sigma_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_merged, stat)),
            np.asarray(getattr(out_ref, stat)),
            rtol=1e-5,
            atol=1e-10,
            err_msg=f"seed {seed}: {stat}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_gradients_finite_at_degenerate_parameters(seed):
    """Gradients must stay finite when strengths sit EXACTLY on the branch
    guards (k1=0, angle=0, k=0, voltage=0, zero-crossing phase): the
    branch-free kernels use additive perturbation guards precisely so that
    `where`-style replacement does not null/NaN the gradient at the guard
    point (reference TODOs in ``drift.py:53``; our ``ops/rmatrix.py``)."""
    from lynx_tpu.functional import track

    segment = _random_segment(seed, n_elements=10)
    # Zero every strength-like parameter: each element becomes drift-like,
    # the exact regime the guards protect.
    for element in segment.elements:
        for attr in ("k1", "angle", "k", "voltage"):
            if hasattr(element, attr):
                setattr(element, attr, jnp.zeros_like(getattr(element, attr)))
        if isinstance(element, lt.Cavity):
            element.phase = jnp.full_like(element.phase, 90.0)  # zero crossing

    beam = lt.ParameterBeam.from_parameters(**BEAM_PARAMS)

    def loss(segment):
        out = track(segment, beam)[0]
        return jnp.sum(
            out.sigma_x + out.sigma_y + jnp.abs(out.mu_x) + jnp.abs(out.mu_y)
        )

    grads = jax.grad(loss)(segment)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf))), (
            f"seed {seed}: non-finite gradient leaf"
        )
