"""Pipeline parallelism over lattice stages (SURVEY.md §2.4 PP row).

Pipelined tracking over a ``("stage",)`` device mesh must equal plain
sequential tracking of the full batch — for both beam types, through
nonlinear (cavity) stage boundaries, with gradients, and with active
apertures (survival materialization).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu.functional import track
from lynx_tpu.parallel import (
    make_pipeline_mesh,
    pipeline_track,
    split_into_stages,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 4, reason="needs 4 (virtual) devices"
    ),
]


def _lattice():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array(0.5)),
            lt.Quadrupole(length=jnp.array(0.2), k1=jnp.array(4.2)),
            lt.Drift(length=jnp.array(0.3)),
            lt.Cavity(
                length=jnp.array(1.0377),
                voltage=jnp.array(1.815e7),
                phase=jnp.array(-30.0),
                frequency=jnp.array(1.3e9),
            ),
            lt.Drift(length=jnp.array(0.4)),
            lt.Quadrupole(length=jnp.array(0.2), k1=jnp.array(-3.1)),
            lt.HorizontalCorrector(length=jnp.array(0.1), angle=jnp.array(1e-4)),
            lt.Drift(length=jnp.array(0.25)),
        ],
        name="pp_test",
    )


def _parameter_beam(batch):
    return lt.ParameterBeam.from_parameters(
        mu_x=jnp.array(1e-4),
        sigma_x=jnp.array(2e-4),
        sigma_y=jnp.array(1.5e-4),
        energy=jnp.array(8e7),
    ).broadcast((batch,))


def _particle_beam(batch, n=512):
    return lt.ParticleBeam.from_parameters(
        num_particles=n,
        mu_x=jnp.array(1e-4),
        sigma_x=jnp.array(2e-4),
        sigma_y=jnp.array(1.5e-4),
        energy=jnp.array(8e7),
        key=jax.random.PRNGKey(0),
    ).broadcast((batch,))


def _assert_beams_close(a, b, atol=1e-9):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_split_into_stages_preserves_tracking():
    segment = _lattice()
    stages = split_into_stages(segment, 4)
    assert len(stages) == 4
    assert sum(len(s.elements) for s in stages) == len(segment.elements)
    beam = _parameter_beam(4)
    ref, _ = track(segment, beam)
    out = beam
    for stage in stages:
        out, _ = track(stage, out)
    _assert_beams_close(out, ref)


@pytest.mark.parametrize("make_beam", [_parameter_beam, _particle_beam])
@pytest.mark.parametrize("num_microbatches", [2, 4])
def test_pipeline_matches_sequential(make_beam, num_microbatches):
    segment = _lattice()
    stages = split_into_stages(segment, 4)
    mesh = make_pipeline_mesh(4)
    beam = make_beam(8)
    ref, _ = track(segment, beam)
    out = pipeline_track(stages, beam, mesh, num_microbatches)
    _assert_beams_close(out, ref)


def test_pipeline_under_jit_matches_sequential():
    segment = _lattice()
    mesh = make_pipeline_mesh(4)
    beam = _parameter_beam(8)

    @jax.jit
    def run(stages, beam):
        return pipeline_track(stages, beam, mesh, 4)

    out = run(split_into_stages(segment, 4), beam)
    ref, _ = track(segment, beam)
    _assert_beams_close(out, ref)


def test_pipeline_gradients_match_sequential():
    segment = _lattice()
    mesh = make_pipeline_mesh(4)
    beam = _parameter_beam(4)

    def loss_pipelined(k1):
        stages = split_into_stages(segment, 4)
        stages[0].elements[1].k1 = k1  # the focusing quad lives in stage 0
        out = pipeline_track(stages, beam, mesh, 2)
        return (out.sigma_x**2).sum()

    def loss_sequential(k1):
        seg = _lattice()
        seg.elements[1].k1 = k1
        out, _ = track(seg, beam)
        return (out.sigma_x**2).sum()

    k1 = jnp.array(4.2)
    g_pipe = jax.grad(loss_pipelined)(k1)
    g_seq = jax.grad(loss_sequential)(k1)
    np.testing.assert_allclose(float(g_pipe), float(g_seq), rtol=1e-6)
    assert abs(float(g_seq)) > 0


def test_pipeline_with_active_aperture_materializes_survival():
    elements = _lattice().elements
    elements[2] = lt.Aperture(
        x_max=jnp.array(3e-4), y_max=jnp.array(3e-4), shape="rectangular"
    )
    segment = lt.Segment(elements, name="pp_aperture")
    stages = split_into_stages(segment, 4)
    mesh = make_pipeline_mesh(4)
    beam = _particle_beam(4)
    ref, _ = track(segment, beam)
    out = pipeline_track(stages, beam, mesh, 2)
    assert out.survival is not None
    np.testing.assert_allclose(
        np.asarray(out.survival), np.asarray(ref.survival), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.sigma_x), np.asarray(ref.sigma_x), atol=1e-9
    )


def test_pipeline_rejects_active_screen_and_bad_shapes():
    segment = _lattice()
    elements = list(segment.elements)
    elements.append(lt.Screen(is_active=True, misalignment=(0.0, 0.0)))
    stages = split_into_stages(lt.Segment(elements, name="pp_s"), 4)
    mesh = make_pipeline_mesh(4)
    beam = _parameter_beam(4)
    with pytest.raises(ValueError, match="Screen"):
        pipeline_track(stages, beam, mesh, 2)

    good_stages = split_into_stages(segment, 4)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_track(good_stages, _parameter_beam(5), mesh, 2)
    with pytest.raises(ValueError, match="stages vs mesh"):
        pipeline_track(good_stages[:3], beam, mesh, 2)
