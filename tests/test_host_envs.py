"""Host-env bridge tests: wrappers, batched host env, host rollout + PPO.

Covers the reference's env_wrappers semantics (action rescale, discretize,
batched stepping with auto-reset) and end-to-end host-mode training with
the same learners used for on-device envs, including a real MuJoCo
(HalfCheetah) smoke test with the tuned ppo.gin wrapper stack.
"""

import gymnasium as gym
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.agents import vtrace as vtrace_agent
from seed_rl_tpu.envs.host import (
    DiscretizeEnvWrapper,
    HostBatchedEnv,
    UniformBoundActionSpaceWrapper,
)
from seed_rl_tpu.models import MLPPolicyNetwork
from seed_rl_tpu.rollout import RolloutEngine
from seed_rl_tpu.rollout_host import HostRolloutEngine
from seed_rl_tpu.utils import episode_stats


class GymToyEnv(gym.Env):
    """Host twin of envs.toy.ToyEnv: match the observed random target."""

    def __init__(self, horizon=3, n_actions=3):
        self.horizon = horizon
        self.n_actions = n_actions
        self.observation_space = gym.spaces.Box(
            -np.inf, np.inf, (n_actions + 1,), np.float32
        )
        self.action_space = gym.spaces.Box(
            -1.0, 1.0, (n_actions,), np.float32
        )
        self._rng = np.random.RandomState(0)

    def _obs(self):
        self._target = self._rng.uniform(
            -1, 1, self.n_actions
        ).astype(np.float32)
        return np.concatenate([self._target, [0.0]]).astype(np.float32)

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._rng = np.random.RandomState(seed)
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        reward = -float(np.sum((action - self._target) ** 2))
        self.t += 1
        terminated = self.t >= self.horizon
        return self._obs(), reward, terminated, False, {}


def test_uniform_bound_wrapper_rescales():
    class FixedEnv(gym.Env):
        observation_space = gym.spaces.Box(-1, 1, (1,), np.float32)
        action_space = gym.spaces.Box(
            np.array([0.0, -4.0], np.float32),
            np.array([2.0, 4.0], np.float32),
            dtype=np.float32,
        )

        def reset(self, seed=None, options=None):
            return np.zeros(1, np.float32), {}

        def step(self, action):
            self.last_action = action
            return np.zeros(1, np.float32), 0.0, False, False, {}

    env = UniformBoundActionSpaceWrapper(FixedEnv())
    np.testing.assert_allclose(env.action_space.low, -1.0)
    env.reset()
    env.step(np.array([1.0, -1.0]))
    np.testing.assert_allclose(
        env.unwrapped.last_action, [2.0, -4.0], atol=1e-6
    )
    env.step(np.array([0.0, 0.5]))
    np.testing.assert_allclose(
        env.unwrapped.last_action, [1.0, 2.0], atol=1e-6
    )


def test_discretize_wrapper_lin_and_log():
    class FixedEnv(gym.Env):
        observation_space = gym.spaces.Box(-1, 1, (1,), np.float32)
        action_space = gym.spaces.Box(-1.0, 1.0, (2,), np.float32)

        def reset(self, seed=None, options=None):
            return np.zeros(1, np.float32), {}

        def step(self, action):
            self.last_action = action
            return np.zeros(1, np.float32), 0.0, False, False, {}

    env = DiscretizeEnvWrapper(FixedEnv(), 5, "lin")
    assert isinstance(env.action_space, gym.spaces.MultiDiscrete)
    env.reset()
    env.step(np.array([0, 4]))
    np.testing.assert_allclose(env.unwrapped.last_action, [-1.0, 1.0])
    env.step(np.array([2, 2]))
    np.testing.assert_allclose(env.unwrapped.last_action, [0.0, 0.0])

    env = DiscretizeEnvWrapper(FixedEnv(), 5, "log", action_ratio=10.0)
    env.reset()
    env.step(np.array([2, 2]))
    np.testing.assert_allclose(env.unwrapped.last_action, [0.0, 0.0])
    env.step(np.array([4, 0]))
    np.testing.assert_allclose(env.unwrapped.last_action, [1.0, -1.0])


def test_host_batched_env_auto_reset_and_abandoned():
    env = HostBatchedEnv(
        lambda i: gym.wrappers.TimeLimit(
            GymToyEnv(horizon=100), max_episode_steps=4
        ),
        num_envs=3,
    )
    out = env.reset(seed=0)
    assert out.observation.shape == (3, 4)
    for t in range(1, 5):
        out = env.step(np.zeros((3, 3), np.float32))
        if t < 4:
            assert not out.done.any()
        else:
            assert out.done.all()
            assert out.abandoned.all()  # TimeLimit truncation
            np.testing.assert_array_equal(out.episode_step, 4)
    out = env.step(np.zeros((3, 3), np.float32))
    np.testing.assert_array_equal(out.episode_step, 1)


def _make_host_vtrace(num_envs=16, unroll_length=10, threads=None):
    env = HostBatchedEnv(
        lambda i: GymToyEnv(horizon=3), num_envs, num_threads=threads
    )
    dist = pd.NormalTanhDistribution(3)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(32, 32)
    )
    agent = PolicyAgent(net, dist)
    engine = HostRolloutEngine(env, agent, unroll_length)
    learner = vtrace_agent.VTraceLearner(
        engine, agent,
        vtrace_agent.VTraceConfig(discounting=0.9, entropy_cost=1e-3),
        optax.adam(3e-3),
    )
    return learner, engine


def test_host_rollout_boundary_overlap():
    learner, engine = _make_host_vtrace(num_envs=4, unroll_length=5)
    state = learner.init(jax.random.PRNGKey(0))
    host_state = engine.init(
        learner.rollout_params(state), jax.random.PRNGKey(1)
    )
    host_state, unroll1 = engine.rollout(
        learner.rollout_params(state), host_state
    )
    host_state, unroll2 = engine.rollout(
        learner.rollout_params(state), host_state
    )
    assert unroll1.timesteps.env_output.reward.shape == (6, 4)
    for a, b in zip(
        jax.tree.leaves(unroll1.timesteps), jax.tree.leaves(unroll2.timesteps)
    ):
        np.testing.assert_array_equal(np.asarray(a[-1]), np.asarray(b[0]))


def test_host_vtrace_learns_toy_env():
    learner, engine = _make_host_vtrace(num_envs=32, threads=4)
    rng = jax.random.PRNGKey(0)
    state = learner.init(rng)
    host_state = engine.init(
        learner.rollout_params(state), jax.random.PRNGKey(1)
    )
    update = jax.jit(learner.update)
    loop_rng = jax.random.PRNGKey(2)

    def run(state, host_state, loop_rng, n):
        for _ in range(n):
            host_state, unroll = engine.rollout(
                learner.rollout_params(state), host_state
            )
            loop_rng, k = jax.random.split(loop_rng)
            state, metrics = update(state, unroll, k)
        return state, host_state, loop_rng, metrics

    state, host_state, loop_rng, _ = run(state, host_state, loop_rng, 30)
    early = float(state.stats.sum_return) / float(state.stats.num_episodes)
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    state, host_state, loop_rng, metrics = run(
        state, host_state, loop_rng, 250
    )
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    state, host_state, loop_rng, metrics = run(
        state, host_state, loop_rng, 40
    )
    late = float(state.stats.sum_return) / float(state.stats.num_episodes)
    assert late > early + 1.0, (early, late)


@pytest.mark.slow
def test_mujoco_halfcheetah_wrapper_stack_and_ppo_smoke():
    from seed_rl_tpu.envs.mujoco import create_environment

    env = create_environment("HalfCheetah-v5")
    assert isinstance(env.action_space, gym.spaces.Box)
    np.testing.assert_allclose(env.action_space.low, -1.0)
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.float32

    batched = HostBatchedEnv(
        lambda i: create_environment("HalfCheetah-v5"), 4, num_threads=4
    )
    dist = pd.NormalTanhDistribution(6)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(64, 64)
    )
    agent = PolicyAgent(net, dist)
    engine = HostRolloutEngine(batched, agent, unroll_length=16)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(), optax.adam(3e-4)
    )
    state = learner.init(jax.random.PRNGKey(0))
    host_state = engine.init(
        learner.rollout_params(state), jax.random.PRNGKey(1)
    )
    host_state, unroll = engine.rollout(
        learner.rollout_params(state), host_state
    )
    state, metrics = jax.jit(learner.update)(
        state, unroll, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(metrics["losses/total"]))
    batched.close()
