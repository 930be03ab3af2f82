"""Tests for the env protocol, auto-reset batching, and the rollout engine.

Covers the reference UnrollStore completion semantics
(/root/reference/tests/utils_test.py:70-273): fixed-length unrolls, +1
boundary overlap between consecutive unrolls, burn-in overlap carryover, and
per-env episode accounting.
"""

import numpy as np
import jax
import jax.numpy as jnp

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.envs import BatchedEnv, TimeLimit, ToyEnv, BitFlippingEnv
from seed_rl_tpu.models import MLPAndLSTM
from seed_rl_tpu.rollout import RolloutEngine


def _make_engine(num_envs=4, unroll_length=5, overlap=0, horizon=3):
    env = BatchedEnv(ToyEnv(horizon=horizon), num_envs)
    dist = pd.NormalTanhDistribution(3)
    net = MLPAndLSTM(
        parametric_distribution_param_size=dist.param_size,
        mlp_sizes=(16,),
        lstm_sizes=(8,),
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(
        env, agent, unroll_length, num_overlapping_steps=overlap
    )
    rng = jax.random.PRNGKey(0)
    _, env_output = env.reset(rng)
    params = agent.init_params(
        jax.random.PRNGKey(1),
        jnp.zeros((num_envs, 3)),
        env_output,
    )
    return engine, params


def test_batched_env_auto_resets_and_counts_steps():
    num_envs, horizon = 3, 4
    env = BatchedEnv(ToyEnv(horizon=horizon), num_envs)
    state, out = env.reset(jax.random.PRNGKey(0))
    assert not np.any(np.asarray(out.done))
    for t in range(1, horizon + 1):
        action = jnp.zeros((num_envs, 3))
        state, out = env.step(state, action)
        if t < horizon:
            assert not np.any(np.asarray(out.done))
            np.testing.assert_array_equal(np.asarray(out.episode_step), t)
        else:
            assert np.all(np.asarray(out.done))
            # Episode step on the done transition is the episode length.
            np.testing.assert_array_equal(np.asarray(out.episode_step), horizon)
    # Next step starts a new episode.
    state, out = env.step(state, jnp.zeros((num_envs, 3)))
    np.testing.assert_array_equal(np.asarray(out.episode_step), 1)
    assert not np.any(np.asarray(out.done))


def test_time_limit_abandons():
    env = BatchedEnv(TimeLimit(ToyEnv(horizon=100), 5), 2)
    state, out = env.reset(jax.random.PRNGKey(0))
    for _ in range(5):
        assert not np.any(np.asarray(out.done))
        state, out = env.step(state, jnp.zeros((2, 3)))
    assert np.all(np.asarray(out.done))
    assert np.all(np.asarray(out.abandoned))


def test_bit_flipping_env_semantics():
    env = BitFlippingEnv(n_bits=4, horizon=6)
    state, obs = env.reset(jax.random.PRNGKey(0))
    bits0 = np.asarray(obs["achieved_goal"]).copy()
    # Flip bit 2.
    result = env.step(state, jnp.array(2, jnp.int32))
    bits1 = np.asarray(result.observation["achieved_goal"])
    assert bits1[2] == 1 - bits0[2]
    assert np.all(np.delete(bits1, 2) == np.delete(bits0, 2))
    # No-op action leaves bits unchanged.
    result2 = env.step(result.state, jnp.array(4, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(result2.observation["achieved_goal"]), bits1
    )
    # Reward is clip(-#mismatches, -1, 0).
    want = max(
        -1.0,
        -float(
            np.sum(bits1 != np.asarray(result.observation["desired_goal"]))
        ),
    )
    assert float(result.reward) == want


def test_rollout_shapes_and_boundary_overlap():
    T, B = 5, 4
    engine, params = _make_engine(num_envs=B, unroll_length=T)
    state = engine.init(params, jax.random.PRNGKey(0))
    state, unroll1 = engine.rollout(params, state)
    state, unroll2 = engine.rollout(params, state)

    obs = unroll1.timesteps.env_output.observation
    assert obs.shape == (T + 1, B, 4)
    assert unroll1.timesteps.agent_output.action.shape == (T + 1, B, 3)

    # Boundary: last timestep of unroll k == first timestep of unroll k+1.
    for leaf1, leaf2 in zip(
        jax.tree.leaves(unroll1.timesteps), jax.tree.leaves(unroll2.timesteps)
    ):
        np.testing.assert_array_equal(
            np.asarray(leaf1[-1]), np.asarray(leaf2[0])
        )


def test_rollout_burn_in_overlap():
    T, B, o = 6, 2, 2
    engine, params = _make_engine(num_envs=B, unroll_length=T, overlap=o)
    state = engine.init(params, jax.random.PRNGKey(0))
    state, unroll1 = engine.rollout(params, state)
    state, unroll2 = engine.rollout(params, state)

    assert unroll1.timesteps.env_output.reward.shape == (o + T + 1, B)
    # Last o+1 timesteps of unroll k == first o+1 of unroll k+1.
    for leaf1, leaf2 in zip(
        jax.tree.leaves(unroll1.timesteps), jax.tree.leaves(unroll2.timesteps)
    ):
        np.testing.assert_array_equal(
            np.asarray(leaf1[-(o + 1):]), np.asarray(leaf2[: o + 1])
        )


def test_rollout_unroll_agent_state_matches_boundary():
    """The stored core state must reproduce the unroll's agent outputs."""
    T, B = 4, 3
    engine, params = _make_engine(num_envs=B, unroll_length=T, horizon=100)
    agent = engine.agent
    state = engine.init(params, jax.random.PRNGKey(0))
    state, unroll1 = engine.rollout(params, state)
    state, unroll2 = engine.rollout(params, state)

    for unroll in (unroll1, unroll2):
        ts = unroll.timesteps
        (logits, baseline), _ = agent.unroll(
            params, ts.prev_action, ts.env_output, unroll.agent_state
        )
        np.testing.assert_allclose(
            np.asarray(logits),
            np.asarray(ts.agent_output.policy_logits),
            rtol=1e-5,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(baseline),
            np.asarray(ts.agent_output.baseline),
            rtol=1e-5,
            atol=1e-5,
        )


def test_rollout_jits_and_first_unroll_starts_at_reset():
    T, B = 3, 2
    engine, params = _make_engine(num_envs=B, unroll_length=T, horizon=50)
    init = jax.jit(engine.init)
    roll = jax.jit(engine.rollout)
    state = init(params, jax.random.PRNGKey(0))
    state, unroll = roll(params, state)
    # First timestep of the first unroll is the reset transition:
    # zero prev_action, zero reward, done=False, episode_step 0.
    ts = unroll.timesteps
    np.testing.assert_array_equal(np.asarray(ts.prev_action[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(ts.env_output.reward[0]), 0.0)
    assert not np.any(np.asarray(ts.env_output.done[0]))
    np.testing.assert_array_equal(
        np.asarray(ts.env_output.episode_step[0]), 0
    )
