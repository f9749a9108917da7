"""ARES-EA tuning environment: vectorization and learning-signal checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lynx_tpu.envs import make_env
from lynx_tpu.envs.ares_ea import default_params


def test_reset_step_shapes():
    env = make_env()
    params = default_params()
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (env.obs_size,)
    action = jnp.zeros((env.num_actions,))
    obs2, state2, reward, done = env.step(state, action, params)
    assert obs2.shape == (env.obs_size,)
    assert jnp.isfinite(reward)
    assert not bool(done)
    assert int(state2.step_count) == 1


@pytest.mark.slow
def test_vmap_over_env_instances():
    env = make_env()
    n = 32
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    params = jax.vmap(default_params)(jax.random.split(jax.random.PRNGKey(1), n))

    reset = jax.jit(jax.vmap(env.reset))
    obs, states = reset(keys, params)
    assert obs.shape == (n, env.obs_size)

    step = jax.jit(jax.vmap(env.step))
    actions = jnp.zeros((n, env.num_actions))
    obs2, states2, rewards, dones = step(states, actions, params)
    assert obs2.shape == (n, env.obs_size)
    assert rewards.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(rewards)))


def test_actions_change_reward():
    env = make_env()
    params = default_params()
    _, state = env.reset(jax.random.PRNGKey(0), params)
    _, _, r0, _ = env.step(state, jnp.zeros(5), params)
    _, _, r1, _ = env.step(state, jnp.array([0.5, -0.5, 0.3, 0.1, -0.1]), params)
    assert float(r0) != float(r1)


def test_reward_is_differentiable():
    """Gradient-based tuning through the env's physics (the gradientbased
    notebook workflow)."""
    env = make_env()
    params = default_params()

    def neg_reward(action):
        beam = env.beam_parameters(jnp.clip(action, -1, 1), params)
        return jnp.sum(jnp.abs(beam - params.target))

    g = jax.grad(neg_reward)(jnp.array([0.1, -0.1, 0.2, 0.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_gradient_descent_improves_reward():
    env = make_env()
    params = default_params()

    def loss(action):
        beam = env.beam_parameters(action, params)
        return jnp.sum(jnp.abs(beam - params.target))

    grad_fn = jax.jit(jax.value_and_grad(loss))
    action = jnp.zeros(5)
    first, _ = grad_fn(action)
    for _ in range(200):
        value, g = grad_fn(action)
        action = jnp.clip(action - 0.03 * jnp.sign(g), -1, 1)
    assert float(value) < float(first)


@pytest.mark.slow
def test_batched_env_matches_vmapped():
    """The natively-batched env path must agree with vmapped per-instance
    stepping (it exists purely to engage the fast tracking paths)."""
    env = make_env()
    n = 8
    params = jax.vmap(default_params)(jax.random.split(jax.random.PRNGKey(1), n))
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    obs_v, states_v = jax.vmap(env.reset)(keys, params)
    actions = jnp.tanh(
        jax.random.normal(jax.random.PRNGKey(2), (n, env.num_actions))
    )
    obs_vm, _, rew_vm, done_vm = jax.vmap(env.step)(states_v, actions, params)
    obs_b, _, rew_b, done_b = env.batched_step(states_v, actions, params)

    np.testing.assert_allclose(
        np.asarray(obs_b), np.asarray(obs_vm), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rew_b), np.asarray(rew_vm), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done_b), np.asarray(done_vm))


def test_batched_reset_shapes():
    env = make_env()
    n = 8
    params = jax.vmap(default_params)(jax.random.split(jax.random.PRNGKey(1), n))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, states = env.batched_reset(keys, params)
    assert obs.shape == (n, env.obs_size)
    assert states.magnets.shape == (n, env.num_actions)
    assert states.step_count.shape == (n,)


def test_gymnasium_adapter_contract():
    """The Gym adapter must satisfy the standard API (spaces, reset/step
    signatures, numpy outputs) so off-the-shelf RL libraries can drive it."""
    gymnasium = pytest.importorskip("gymnasium")
    from lynx_tpu.envs.ares_ea import AresEAGymEnv

    env = AresEAGymEnv(seed=0)
    obs, info = env.reset(seed=42)
    assert isinstance(obs, np.ndarray) and obs.shape == (env._env.obs_size,)
    assert isinstance(info, dict)
    assert env.observation_space.contains(obs.astype(np.float32))

    action = env.action_space.sample()
    obs2, reward, terminated, truncated, info = env.step(action)
    assert isinstance(obs2, np.ndarray) and obs2.shape == obs.shape
    assert isinstance(reward, float) and np.isfinite(reward)
    assert terminated is False and truncated is False

    # Same seed -> same initial observation (reproducibility).
    obs3, _ = env.reset(seed=42)
    np.testing.assert_array_equal(obs3, obs)
