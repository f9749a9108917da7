"""Kernel routing resolution (VERDICT r3 next #9): routing must follow the
beam's committed device / an explicit ``platform`` argument, not the
process-default backend, and the TPU-routed graph must be compilable from
CPU without monkeypatching the module-level force knobs."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import lynx_tpu as lt
import lynx_tpu.ops.pallas_track as pallas_track
from lynx_tpu.accelerator.segment import (
    PALLAS_SWEEP_THRESHOLD,
    resolve_platform,
)
from lynx_tpu.functional import track


def _sweep_workload(B):
    """A ParameterBeam settings sweep big enough to hit the fused-sweep
    routing threshold."""
    segment = lt.Segment(
        [
            lt.Drift(jnp.full((B,), 0.3)),
            lt.Quadrupole(jnp.full((B,), 0.12), k1=jnp.linspace(-5, 5, B)),
            lt.Drift(jnp.full((B,), 0.5)),
        ]
    )
    beam = lt.ParameterBeam.from_parameters(
        sigma_x=jnp.full((B,), 1.75e-4), energy=jnp.full((B,), 1e8)
    )
    return segment, beam


def test_resolve_platform_prefers_explicit_argument():
    _, beam = _sweep_workload(4)
    assert resolve_platform(beam, "tpu") == "tpu"
    assert resolve_platform(beam, "cpu") == "cpu"


def test_resolve_platform_reads_committed_device():
    _, beam = _sweep_workload(4)
    device = jax.devices("cpu")[0]
    committed = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device), beam
    )
    assert resolve_platform(committed) == "cpu"


def test_resolve_platform_falls_back_to_default_backend_for_tracers():
    _, beam = _sweep_workload(4)

    records = []

    @jax.jit
    def probe(beam):
        records.append(resolve_platform(beam))
        return beam.energy

    probe(beam)
    assert records == [jax.default_backend()]


def test_tpu_routed_graph_compiles_from_cpu_without_global_knobs(monkeypatch):
    """``platform="tpu"`` + interpret-mode pallas compiles and runs the
    exact graph ``Segment.track`` routes on a TPU — from a CPU host, with
    the FUSED_SWEEP_PATH/PARTICLE_SWEEP_PATH globals untouched."""
    from lynx_tpu.accelerator import segment as segment_mod

    assert segment_mod.FUSED_SWEEP_PATH is None
    assert segment_mod.PARTICLE_SWEEP_PATH is None
    # Interpret-mode pallas so the Mosaic kernel executes on CPU. This is
    # an execution-backend substitution, not a routing knob.
    monkeypatch.setattr(
        pallas_track.pl,
        "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )

    B = PALLAS_SWEEP_THRESHOLD  # large enough to engage the fused sweep
    segment, beam = _sweep_workload(B)

    cpu_routed = segment.track(beam, platform="cpu")
    tpu_routed = segment.track(beam, platform="tpu")
    np.testing.assert_allclose(
        np.asarray(tpu_routed._mu),
        np.asarray(cpu_routed._mu),
        rtol=1e-4,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(tpu_routed._cov),
        np.asarray(cpu_routed._cov),
        rtol=2e-3,
        atol=1e-14,
    )


def test_particle_moment_sweep_routes_by_platform(monkeypatch):
    """``sweep_particle_moments`` must resolve its path like the rest of
    ``track`` (ADVICE r4): ``platform="cpu"`` (or a CPU-committed cloud)
    takes the XLA reference even when the process default is TPU; the
    Pallas kernel is only entered on the tpu route."""
    from lynx_tpu.accelerator.fused import particle_moment_plan

    B = 4
    beam = lt.ParticleBeam.from_parameters(
        num_particles=500,
        sigma_x=jnp.array([1.75e-4]),
        energy=jnp.array([1e8]),
        key=jax.random.PRNGKey(0),
        dtype=jnp.float32,
    )
    elements = [
        lt.Drift(jnp.array([0.3])),
        lt.Quadrupole(jnp.array([0.12]), k1=jnp.linspace(-5, 5, B)),
    ]
    entries, scalars = particle_moment_plan(
        elements,
        beam.energy,
        lambda x: jnp.broadcast_to(jnp.reshape(jnp.asarray(x), (-1,)), (B,)),
    )
    particles = beam.particles[0]
    weights = jnp.ones(particles.shape[:1], particles.dtype)

    assert pallas_track.PARTICLE_MOMENT_SWEEP_PATH is None
    original_pallas_call = pl.pallas_call

    def forbidden(*args, **kwargs):  # pragma: no cover - failure path
        raise AssertionError("pallas kernel entered on the cpu route")

    monkeypatch.setattr(pallas_track.pl, "pallas_call", forbidden)
    # Explicit platform override wins.
    mu_c, cov_c, w_c = pallas_track.sweep_particle_moments(
        entries, scalars, particles, weights, platform="cpu"
    )
    # Committed-device resolution: a CPU-committed cloud routes cpu too.
    cpu_dev = jax.devices("cpu")[0]
    mu_d, cov_d, w_d = pallas_track.sweep_particle_moments(
        entries,
        tuple(jax.device_put(s, cpu_dev) for s in scalars),
        jax.device_put(particles, cpu_dev),
        jax.device_put(weights, cpu_dev),
    )
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_d), rtol=1e-6)

    # The tpu route does enter the kernel (interpret-mode substitution).
    monkeypatch.setattr(
        pallas_track.pl,
        "pallas_call",
        functools.partial(original_pallas_call, interpret=True),
    )
    mu_t, cov_t, w_t = pallas_track.sweep_particle_moments(
        entries, scalars, particles, weights, platform="tpu"
    )
    np.testing.assert_allclose(
        np.asarray(mu_t), np.asarray(mu_c), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(w_t), np.asarray(w_c), rtol=1e-6)


def test_functional_track_threads_platform(monkeypatch):
    calls = []
    original = pallas_track.fused_moment_sweep_plan

    def spy(plan, energy, mu, cov):
        calls.append(energy.shape)
        return original(plan, energy, mu, cov)

    monkeypatch.setattr(pallas_track, "fused_moment_sweep_plan", spy)
    monkeypatch.setattr(
        pallas_track.pl,
        "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    B = PALLAS_SWEEP_THRESHOLD
    segment, beam = _sweep_workload(B)

    out_cpu, _ = track(segment, beam, platform="cpu")
    assert not calls  # cpu routing never touches the fused sweep
    out_tpu, _ = track(segment, beam, platform="tpu")
    assert calls  # tpu routing does
    np.testing.assert_allclose(
        np.asarray(out_tpu._mu), np.asarray(out_cpu._mu), rtol=1e-4, atol=1e-9
    )
