"""SAC learner tests: learning on ToyEnv + HER/BitFlipping coverage.

Mirrors the reference SAC structure at toy scale: uniform replay, polyak
targets, entropy-constrained alpha, DDPG-style actor gradient (continuous)
and normalized-advantage PG actor (discrete), HER goal relabeling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agents import sac
from seed_rl_tpu.envs import BatchedEnv, BitFlippingEnv, ToyEnv
from seed_rl_tpu.envs.toy import BitFlippingEnv as BFE
from seed_rl_tpu.models.sac_nets import ActorCriticMLP
from seed_rl_tpu.rollout import RolloutEngine
from seed_rl_tpu.utils import episode_stats


def _make_continuous_learner(num_envs=32, batch_size=64):
    env = BatchedEnv(ToyEnv(horizon=3), num_envs)
    dist = pd.NormalTanhDistribution(3)
    net = ActorCriticMLP(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2,
        mlp_sizes=(64, 64),
    )
    agent = sac.SACAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length=1)
    config = sac.SACConfig(
        discounting=0.9,
        entropy_cost=0.05,
        target_entropy=-3.0,
        batch_size=batch_size,
        replay_buffer_size=4096,
        replay_buffer_min_size=256,
        polyak=0.95,
    )
    learner = sac.SACLearner(
        engine, agent, config, optax.adam(3e-3)
    )
    return learner


def test_sac_learns_toy_env():
    learner = _make_continuous_learner()
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < learner.config.replay_buffer_min_size:
        state = warmup(state)

    run = jax.jit(lambda s: learner.train_many(s, 50))
    state, _ = run(state)
    early = float(state.stats.sum_return) / float(state.stats.num_episodes)
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(6):
        state, metrics = run(state)
    late = float(state.stats.sum_return) / float(state.stats.num_episodes)
    assert late > early + 1.0, (early, late)
    assert np.isfinite(float(metrics["losses/total"]))


def test_sac_polyak_target_moves_toward_online():
    learner = _make_continuous_learner(num_envs=8, batch_size=16)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    for _ in range(40):
        state = warmup(state)
    state2, _ = jax.jit(learner.train_step)(state)
    # Target moved a bit toward online but is not equal to it.
    t0 = jax.tree.leaves(state.target_net_params)[0]
    t1 = jax.tree.leaves(state2.target_net_params)[0]
    online = jax.tree.leaves(state2.params["net"])[0]
    assert not np.allclose(np.asarray(t0), np.asarray(t1))
    assert not np.allclose(np.asarray(t1), np.asarray(online))


def test_sac_her_bitflipping_runs_and_improves():
    num_envs, n_bits, horizon = 16, 4, 8
    window = 8
    env = BatchedEnv(BitFlippingEnv(n_bits=n_bits, horizon=horizon), num_envs)
    dist = pd.CategoricalDistribution(n_bits + 1)
    net = ActorCriticMLP(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2,
        mlp_sizes=(64, 64),
        action_dim=1,
    )
    agent = sac.SACAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length=window)
    config = sac.SACConfig(
        discounting=0.98,
        entropy_cost=0.05,
        batch_size=64,
        replay_buffer_size=1024,
        replay_buffer_min_size=128,
        unroll_length=2,
        her_window_length=window,
        her_substitution_probability=0.8,
        polyak=0.95,
        train_batches_per_step=2,
    )
    learner = sac.SACLearner(
        engine,
        agent,
        config,
        optax.adam(3e-3),
        compute_reward_fn=BFE.compute_reward,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    run = jax.jit(lambda s: learner.train_many(s, 50))
    state, _ = run(state)
    early = float(state.stats.sum_return) / float(state.stats.num_episodes)
    for _ in range(5):
        state, metrics = run(state)
    # Measure on a fresh window at the end.
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(2):
        state, metrics = run(state)
    late = float(state.stats.sum_return) / float(state.stats.num_episodes)
    # BitFlipping returns are in [-horizon, 0]; HER must drive improvement.
    assert late > early + 1.5, (early, late)
    assert np.isfinite(float(metrics["losses/total"]))


def test_sac_discrete_actor_uses_pg_path():
    # Categorical distribution is not reparametrizable -> PG actor loss.
    dist = pd.CategoricalDistribution(5)
    assert not dist.reparametrizable
