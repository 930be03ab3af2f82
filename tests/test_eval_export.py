"""Tests for the eval harness and policy export."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.envs import BatchedEnv, DiscreteMatchEnv, ToyEnv
from seed_rl_tpu.evaluation import run_eval
from seed_rl_tpu.models import MLPPolicyNetwork, MLPAndLSTM
from seed_rl_tpu.types import EnvOutput


def _make_agent_and_params(num_envs, obs_dim=4, n_actions=4, lstm=False):
    dist = pd.CategoricalDistribution(n_actions)
    if lstm:
        net = MLPAndLSTM(
            parametric_distribution_param_size=dist.param_size,
            mlp_sizes=(16,),
            lstm_sizes=(8,),
        )
    else:
        net = MLPPolicyNetwork(
            parametric_distribution_param_size=dist.param_size,
            mlp_sizes=(16,),
        )
    agent = PolicyAgent(net, dist)
    env_output = EnvOutput(
        reward=jnp.zeros((num_envs,)),
        done=jnp.zeros((num_envs,), bool),
        observation=jnp.zeros((num_envs, obs_dim)),
        abandoned=jnp.zeros((num_envs,), bool),
        episode_step=jnp.zeros((num_envs,), jnp.int32),
    )
    params = agent.init_params(
        jax.random.PRNGKey(0), jnp.zeros((num_envs,), jnp.int32), env_output
    )
    return agent, params, env_output


def test_run_eval_collects_episodes():
    num_envs = 8
    env = BatchedEnv(DiscreteMatchEnv(n_actions=4, horizon=10), num_envs)
    agent, params, _ = _make_agent_and_params(num_envs)
    metrics = run_eval(
        env, agent, params, jax.random.PRNGKey(0),
        num_episodes=16, unroll_length=10,
    )
    assert metrics["eval/num_episodes"] >= 16
    assert metrics["eval/mean_length"] == 10.0
    assert 0.0 <= metrics["eval/mean_return"] <= 10.0


def test_run_eval_is_deterministic():
    num_envs = 4
    agent, params, _ = _make_agent_and_params(num_envs)
    env = BatchedEnv(DiscreteMatchEnv(n_actions=4, horizon=10), num_envs)
    m1 = run_eval(env, agent, params, jax.random.PRNGKey(3),
                  num_episodes=8, unroll_length=10)
    m2 = run_eval(env, agent, params, jax.random.PRNGKey(3),
                  num_episodes=8, unroll_length=10)
    assert m1["eval/mean_return"] == m2["eval/mean_return"]


def test_export_and_reload_policy(tmp_path):
    from seed_rl_tpu.utils.export import export_policy, load_policy

    num_envs = 4
    agent, params, env_output = _make_agent_and_params(num_envs, lstm=True)
    prev_action = jnp.zeros((num_envs,), jnp.int32)
    core_state = agent.initial_state(num_envs)
    rng = jax.random.PRNGKey(0)

    export_policy(
        str(tmp_path / "export"), agent, params, prev_action, env_output
    )
    policy = load_policy(str(tmp_path / "export"))
    action, new_state = policy(prev_action, env_output, core_state, rng)

    want, want_state = agent.policy_step(
        params, prev_action, env_output, core_state, rng, deterministic=True
    )
    np.testing.assert_array_equal(np.asarray(action), np.asarray(want.action))
    for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(want_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
