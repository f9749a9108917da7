"""JIT/compile-contract tests: the lattice is a pytree argument, so
re-tuning magnets must NOT recompile; structural changes may."""

import jax
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt
from lynx_tpu.functional import track


def _segment():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5]), name="d1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
            lt.Drift(length=jnp.array([0.5]), name="d2"),
        ],
        name="seg",
    )


def _beam():
    return lt.ParticleBeam.from_parameters(
        num_particles=1000, sigma_x=jnp.array([1e-4]), energy=jnp.array([1e8])
    )


def test_retuning_does_not_recompile():
    traces = 0

    def counted(segment, beam):
        nonlocal traces
        traces += 1
        out, _ = track(segment, beam)
        return out.sigma_x

    jitted = jax.jit(counted)
    segment = _segment()
    beam = _beam()
    jitted(segment, beam)
    assert traces == 1
    segment.q1.k1 = jnp.array([-1.0], dtype=jnp.float32)  # keep dtype: new
    # values with the same aval must hit the jit cache
    jitted(segment, beam)
    assert traces == 1  # same treedef -> cache hit
    # Structural change (extra element) retraces.
    bigger = lt.Segment(_segment().elements + [lt.Drift(jnp.array([0.1]))])
    jitted(bigger, beam)
    assert traces == 2


def test_jit_matches_eager():
    segment = _segment()
    beam = _beam()
    eager, _ = track(segment, beam)
    jitted, _ = jax.jit(track)(segment, beam)
    np.testing.assert_allclose(
        np.asarray(eager.particles), np.asarray(jitted.particles), rtol=1e-5,
        atol=1e-9,
    )


def test_jit_with_diagnostics_outputs():
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5])),
            lt.BPM(is_active=True, name="bpm1"),
            lt.Aperture(
                x_max=jnp.array([1e-4]), y_max=jnp.array([1e-4]), name="ap1"
            ),
            lt.Screen(
                resolution=(32, 32),
                pixel_size=jnp.array((1e-5, 1e-5)),
                is_active=True,
                name="scr1",
            ),
        ]
    )
    beam = _beam()
    out, diags = jax.jit(track)(segment, beam)
    assert out is None  # absorbed by screen
    assert set(diags) == {"bpm1", "ap1", "scr1"}
    assert diags["scr1"].shape == (1, 32, 32)
    assert diags["ap1"].shape == (1, 1000)
    assert np.all(np.isfinite(np.asarray(diags["bpm1"])))


def test_grad_jit_compose():
    segment = _segment()
    beam = _beam()

    @jax.jit
    def loss_grad(seg):
        def loss(s):
            out, _ = track(s, beam)
            return jnp.sum(out.sigma_x**2)

        return jax.value_and_grad(loss)(seg)

    value, grads = loss_grad(segment)
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grads.q1.k1)))
