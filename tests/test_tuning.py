"""On-device scanned tuning loop (``lynx_tpu.tuning``).

The scanned tuner compiles K optimizer steps into one ``lax.scan`` dispatch;
it must be bit-compatible with the reference-style Python loop of jitted
single steps (same optimizer, same updates), not merely "also converge".
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import lynx_tpu as lt
from lynx_tpu.functional import track
from lynx_tpu.tuning import make_tuner, tune


def quad_lattice():
    return lt.Segment(
        [
            lt.Drift(length=jnp.array([0.5])),
            lt.Quadrupole(
                length=jnp.array([0.2]), k1=jnp.array([3.0]), name="Q1"
            ),
            lt.Drift(length=jnp.array([0.7])),
        ]
    )


def small_beam():
    return lt.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.array([1.75e-4]),
        sigma_y=jnp.array([1.75e-4]),
        sigma_xp=jnp.array([2e-5]),
        sigma_yp=jnp.array([2e-5]),
        energy=jnp.array([1e8]),
        key=jax.random.PRNGKey(3),
    )


def test_scanned_tuner_matches_python_loop():
    beam = small_beam()
    segment = quad_lattice()

    def loss_fn(k1, beam):
        seg = quad_lattice()
        seg.Q1.k1 = k1
        outgoing, _ = track(seg, beam)
        return jnp.sum((outgoing.sigma_x - 1e-4) ** 2) * 1e8

    optimizer = optax.adam(1e-1)
    k1 = segment.Q1.k1
    opt_state = optimizer.init(k1)

    tuner = make_tuner(optimizer, loss_fn)
    k1_scan, _, losses = tuner(k1, opt_state, 20, beam)

    # Reference: the same 20 steps dispatched one by one.
    @jax.jit
    def step(k1, opt_state, beam):
        loss, grads = jax.value_and_grad(loss_fn)(k1, beam)
        updates, opt_state = optimizer.update(grads, opt_state, k1)
        return optax.apply_updates(k1, updates), opt_state, loss

    k1_loop, opt_state_loop = segment.Q1.k1, optimizer.init(segment.Q1.k1)
    loop_losses = []
    for _ in range(20):
        k1_loop, opt_state_loop, loss = step(k1_loop, opt_state_loop, beam)
        loop_losses.append(float(loss))

    np.testing.assert_allclose(k1_scan, k1_loop, rtol=1e-6)
    np.testing.assert_allclose(losses, jnp.array(loop_losses), rtol=1e-5)


def test_tuner_reduces_loss_on_segment_pytree():
    """Whole-segment params: every array leaf is trainable through the scan."""
    beam = small_beam()
    segment = quad_lattice()
    target = jnp.array([2e-4])

    def loss_fn(segment, beam):
        outgoing, _ = track(segment, beam)
        return jnp.sum((outgoing.sigma_x - target) ** 2) * 1e8

    optimizer = optax.adam(5e-2)
    tuner = make_tuner(optimizer, loss_fn)
    tuned, _, losses = tuner(segment, optimizer.init(segment), 30, beam)

    assert float(losses[-1]) < 0.2 * float(losses[0])
    assert isinstance(tuned, lt.Segment)
    assert tuned.Q1.k1.shape == segment.Q1.k1.shape


def test_tune_chunked_callback_matches_single_scan():
    beam = small_beam()

    def loss_fn(k1, beam):
        seg = quad_lattice()
        seg.Q1.k1 = k1
        outgoing, _ = track(seg, beam)
        return jnp.sum((outgoing.sigma_x - 1e-4) ** 2) * 1e8

    k1 = jnp.array([3.0])
    optimizer = optax.adam(1e-1)
    whole, losses_whole = tune(
        loss_fn, k1, beam, optimizer=optimizer, steps=24
    )
    seen = []
    chunked, losses_chunked = tune(
        loss_fn,
        k1,
        beam,
        optimizer=optimizer,
        steps=24,
        chunk=8,
        callback=lambda i, loss: seen.append((i, loss)),
    )
    np.testing.assert_allclose(whole, chunked, rtol=1e-6)
    np.testing.assert_allclose(losses_whole, losses_chunked, rtol=1e-5)
    assert [i for i, _ in seen] == [7, 15, 23]
    assert losses_chunked.shape == (24,)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_scanned_tuner_composes_with_sharding():
    """The scan loop keeps mesh shardings: tuning with a (batch x particles)-
    sharded beam matches the unsharded scan."""
    from lynx_tpu.parallel import make_mesh, shard_beam

    mesh = make_mesh(8)
    batch = 2 * mesh.shape["batch"]
    num_particles = 64 * mesh.shape["particles"]

    def lattice(k1):
        return lt.Segment(
            [
                lt.Drift(length=jnp.full((batch,), 0.5)),
                lt.Quadrupole(length=jnp.full((batch,), 0.2), k1=k1, name="Q1"),
                lt.Drift(length=jnp.full((batch,), 0.7)),
            ]
        )

    beam = lt.ParticleBeam.from_parameters(
        num_particles=num_particles,
        sigma_x=jnp.full((batch,), 1.75e-4),
        sigma_y=jnp.full((batch,), 1.75e-4),
        sigma_xp=jnp.full((batch,), 2e-5),
        sigma_yp=jnp.full((batch,), 2e-5),
        energy=jnp.full((batch,), 1e8),
        key=jax.random.PRNGKey(7),
    )

    def loss_fn(k1, beam):
        outgoing, _ = track(lattice(k1), beam)
        return jnp.sum((outgoing.sigma_x - 1e-4) ** 2) * 1e8

    optimizer = optax.adam(1e-1)
    tuner = make_tuner(optimizer, loss_fn)
    k1_0 = jnp.linspace(2.0, 4.0, batch)

    ref, _, ref_losses = tuner(k1_0, optimizer.init(k1_0), 10, beam)

    with mesh:
        sharded = shard_beam(beam, mesh)
        out, _, losses = tuner(k1_0, optimizer.init(k1_0), 10, sharded)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(ref_losses), rtol=1e-5
    )


@pytest.mark.parametrize("steps,chunk", [(5, 2), (6, 6), (4, None)])
def test_tune_step_counts(steps, chunk):
    def loss_fn(p):
        return jnp.sum(p**2)

    p, losses = tune(
        loss_fn, jnp.array([1.0, -2.0]), steps=steps, chunk=chunk
    )
    assert losses.shape == (steps,)
    assert float(losses[-1]) < float(losses[0])


def test_tune_until_stops_early_on_convergence():
    from lynx_tpu.tuning import tune_until

    def loss_fn(p):
        return jnp.sum(p**2)

    p, losses, n = tune_until(
        loss_fn,
        jnp.array([1.0, -2.0]),
        optimizer=optax.sgd(0.4),
        tol=1e-6,
        max_steps=500,
    )
    n = int(n)
    assert 2 <= n < 500, n  # converged well before the cap
    assert np.all(np.isfinite(np.asarray(losses[:n])))
    assert np.all(np.isnan(np.asarray(losses[n:])))  # NaN-padded tail
    assert float(losses[n - 1]) < 1e-4
    # Relative improvement at the stop point is actually below tol.
    assert abs(float(losses[n - 2]) - float(losses[n - 1])) <= 1e-6 * max(
        1.0, abs(float(losses[n - 1]))
    )


def test_tune_until_respects_max_steps():
    from lynx_tpu.tuning import tune_until

    def loss_fn(p):
        return jnp.sum(p**2)

    # Tiny LR: never converges within 7 steps -> runs to the cap.
    p, losses, n = tune_until(
        loss_fn,
        jnp.array([5.0]),
        optimizer=optax.sgd(1e-4),
        tol=1e-12,
        max_steps=7,
    )
    assert int(n) == 7
    assert np.all(np.isfinite(np.asarray(losses)))


def test_quad_scan_emittance_reconstruction():
    """The quad-scan workflow (examples/emittance_measurement.py): fitting
    the incoming beam's transverse moments through differentiable tracking
    recovers the true emittance."""
    import pathlib
    import runpy

    mod = runpy.run_path(
        str(
            pathlib.Path(__file__).parent.parent
            / "examples"
            / "emittance_measurement.py"
        )
    )

    true_beam = lt.ParameterBeam.from_twiss(
        beta_x=jnp.array([8.0]),
        alpha_x=jnp.array([-1.5]),
        emittance_x=jnp.array([2.2e-9]),
        energy=jnp.array([1.5e8]),
    )
    k1_scan = jnp.linspace(-14.0, 14.0, 9)
    measured = jax.jit(
        jax.vmap(mod["simulated_sigma_x"], in_axes=(0, None))
    )(k1_scan, true_beam)

    def loss_fn(params, k1_scan, measured):
        predicted = jax.vmap(mod["simulated_sigma_x"], in_axes=(0, None))(
            k1_scan, _beam(params)
        )
        return jnp.mean((predicted / measured - 1.0) ** 2)

    def _beam(params):
        s11 = jnp.exp(params[0]) * 1e-8
        s22 = jnp.exp(params[1]) * 1e-10
        s12 = jnp.tanh(params[2]) * jnp.sqrt(s11 * s22)
        mu = jnp.zeros((1, 7)).at[..., 6].set(1.0)
        cov = jnp.zeros((1, 7, 7))
        cov = cov.at[..., 0, 0].set(s11)
        cov = cov.at[..., 0, 1].set(s12)
        cov = cov.at[..., 1, 0].set(s12)
        cov = cov.at[..., 1, 1].set(s22)
        return lt.ParameterBeam(
            mu, cov, energy=jnp.array([1.5e8]), total_charge=jnp.array([0.0])
        )

    params, losses = tune(
        loss_fn,
        jnp.array([jnp.log(2.0), jnp.log(2.0), 0.0]),
        k1_scan,
        measured,
        optimizer=optax.adam(5e-2),
        steps=400,
    )
    fitted = _beam(params)
    s11 = float(fitted._cov[0, 0, 0])
    s12 = float(fitted._cov[0, 0, 1])
    s22 = float(fitted._cov[0, 1, 1])
    emittance = (s11 * s22 - s12**2) ** 0.5
    assert abs(emittance / 2.2e-9 - 1) < 0.01, emittance
