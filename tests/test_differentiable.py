"""Differentiability (mirrors reference ``tests/test_differentiable.py``):
gradients must flow from magnet parameters and from the incoming beam to the
outgoing beam — here asserted as finite, non-zero ``jax.grad`` values."""

import jax
import jax.numpy as jnp
import numpy as np

import lynx_tpu as lt
from lynx_tpu.functional import track


def _beam():
    return lt.ParticleBeam.from_parameters(
        num_particles=5_000,
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        sigma_xp=jnp.array([2e-5]),
        sigma_yp=jnp.array([2e-5]),
        energy=jnp.array([1e8]),
    )


def test_grad_through_dqd_wrt_k1():
    beam = _beam()

    def loss(k1):
        segment = lt.Segment(
            [
                lt.Drift(length=jnp.array([0.5])),
                lt.Quadrupole(length=jnp.array([0.2]), k1=k1),
                lt.Drift(length=jnp.array([0.5])),
            ]
        )
        return jnp.sum(segment.track(beam).sigma_x ** 2)

    g = jax.grad(loss)(jnp.array([4.2]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_grad_wrt_whole_segment_pytree():
    """jax.grad over the segment itself returns a segment-shaped gradient —
    the idiomatic replacement for ``nn.Parameter`` magnet wrapping."""
    beam = _beam()
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5]), name="d1"),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2]), name="q1"),
            lt.HorizontalCorrector(
                length=jnp.array([0.1]), angle=jnp.array([1e-4]), name="hc"
            ),
            # Drift after the corrector so its kick reaches mu_x in the loss.
            lt.Drift(length=jnp.array([0.5]), name="d2"),
        ],
        name="seg",
    )

    def loss(seg):
        out, _ = track(seg, beam)
        return jnp.sum(out.sigma_x**2) + jnp.sum(out.mu_x**2)

    grads = jax.grad(loss)(segment)
    assert np.all(np.isfinite(np.asarray(grads.q1.k1)))
    assert float(jnp.abs(grads.q1.k1).max()) > 0
    assert float(jnp.abs(grads.hc.angle).max()) > 0


def test_grad_wrt_incoming_beam():
    segment = lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5])),
            lt.Quadrupole(length=jnp.array([0.2]), k1=jnp.array([4.2])),
        ]
    )
    beam = _beam()

    def loss(particles):
        moved = lt.ParticleBeam(
            particles, beam.energy, particle_charges=beam.particle_charges
        )
        return jnp.sum(segment.track(moved).sigma_x ** 2)

    g = jax.grad(loss)(beam.particles)
    assert g.shape == beam.particles.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_grad_through_ares_ea():
    """Gradients flow end-to-end through the full ARES EA segment
    (analog of reference ``test_differentiable.py`` ARES case)."""
    from lynx_tpu.models import ares_ea_segment

    segment = ares_ea_segment()
    beam = _beam()

    def loss(seg):
        out, _ = track(seg, beam)
        if out is None:  # screen absorbed — use its image instead
            raise AssertionError("expected inactive screen")
        return jnp.sum(out.sigma_x**2)

    grads = jax.grad(loss)(segment)
    g_q1 = np.asarray(grads.AREAMQZM1.k1)
    assert np.all(np.isfinite(g_q1))
    assert np.abs(g_q1).max() > 0


def test_grad_through_cavity():
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.array([1e-4]), energy=jnp.array([6e6])
    )

    def loss(voltage):
        cavity = lt.Cavity(
            length=jnp.array([1.0377]),
            voltage=voltage,
            frequency=jnp.array([1.3e9]),
            phase=jnp.array([0.0]),
        )
        return jnp.sum(cavity.track(beam).sigma_x ** 2) * 1e12

    g = jax.grad(loss)(jnp.array([0.01815975e9]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_grad_through_screen_image():
    """Differentiating a screen image w.r.t. magnet strength (weighted
    histograms are differentiable in the weights; position gradients flow
    through the moments path)."""
    beam = _beam()

    def loss(k1):
        segment = lt.Segment(
            [
                lt.Quadrupole(length=jnp.array([0.2]), k1=k1, name="q"),
                lt.Drift(length=jnp.array([0.5])),
            ]
        )
        out, _ = track(segment, beam)
        return jnp.sum(out.sigma_x**2) * 1e8

    g = jax.grad(loss)(jnp.array([4.2]))
    assert np.all(np.isfinite(np.asarray(g)))
