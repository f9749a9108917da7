"""Structured logging / metrics tests (SURVEY.md §5 metrics/logging row).

Covers: converter warnings routed through the ``lynx_tpu`` logger
(replacing the reference's bare prints, reference
``converters/ocelot.py:139-141``, ``bmad.py:632-635``), host-side metric
lines, jit-safe ``emit_metrics``, and per-step beam-stat emission from
the RL env wrapper."""

import logging

import jax
import jax.numpy as jnp
import pytest

import lynx_tpu as lt
from lynx_tpu.metrics import beam_stats, emit_metrics, format_metrics, log_metrics


def test_ocelot_unknown_element_warning_is_logged(caplog):
    from lynx_tpu.converters.ocelot import ocelot2lynx

    class Mystery:
        id = "weird"
        l = 0.5  # noqa: E741

    with caplog.at_level(logging.WARNING, logger="lynx_tpu"):
        converted = ocelot2lynx(Mystery())
    assert isinstance(converted, lt.Drift)
    assert any("Unknown element weird" in r.message for r in caplog.records)
    assert all(r.name.startswith("lynx_tpu") for r in caplog.records)


def test_format_metrics_stable_order():
    line = format_metrics({"b": 2.0, "a": 1.0}, step=3)
    assert line == "step=3 a=1 b=2"


def test_log_metrics_and_beam_stats(caplog):
    beam = lt.ParameterBeam.from_parameters(sigma_x=jnp.array([2e-4]))
    with caplog.at_level(logging.INFO, logger="lynx_tpu"):
        log_metrics(step=7, **beam_stats(beam))
    (record,) = caplog.records
    assert "step=7" in record.message
    assert "sigma_x=0.0002" in record.message


def test_emit_metrics_inside_jit(caplog):
    @jax.jit
    def f(x):
        emit_metrics({"loss": jnp.mean(x)}, step=jnp.array(4))
        return x * 2

    with caplog.at_level(logging.INFO, logger="lynx_tpu"):
        out = f(jnp.arange(4.0))
        jax.block_until_ready(out)
        jax.effects_barrier()
    assert any("step=4" in r.message and "loss=1.5" in r.message for r in caplog.records)


@pytest.mark.slow
def test_env_emits_per_step_beam_metrics(caplog):
    from lynx_tpu.envs import make_env
    from lynx_tpu.envs.ares_ea import default_params

    env = make_env(log_metrics=True)
    n = 4
    params = jax.vmap(default_params)(jax.random.split(jax.random.PRNGKey(1), n))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, states = env.batched_reset(keys, params)
    actions = jnp.zeros((n, env.num_actions))
    with caplog.at_level(logging.INFO, logger="lynx_tpu"):
        out = jax.jit(env.batched_step)(states, actions, params)
        jax.block_until_ready(out)
        jax.effects_barrier()
    metric_lines = [r.message for r in caplog.records if "sigma_x=" in r.message]
    assert metric_lines, "no beam-stat metrics emitted"
    assert "step=1" in metric_lines[0]
    assert "reward=" in metric_lines[0]


@pytest.mark.slow
def test_metrics_off_by_default(caplog):
    from lynx_tpu.envs import make_env
    from lynx_tpu.envs.ares_ea import default_params

    env = make_env()
    params = jax.vmap(default_params)(jax.random.split(jax.random.PRNGKey(1), 2))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    obs, states = env.batched_reset(keys, params)
    with caplog.at_level(logging.INFO, logger="lynx_tpu"):
        out = env.batched_step(states, jnp.zeros((2, env.num_actions)), params)
        jax.block_until_ready(out)
        jax.effects_barrier()
    assert not [r for r in caplog.records if "sigma_x=" in r.message]
