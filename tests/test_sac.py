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


def _make_recurrent_net(dist, n_critics=2):
    from seed_rl_tpu.models.sac_nets import ActorCriticLSTM

    return ActorCriticLSTM(
        parametric_distribution_param_size=dist.param_size,
        n_critics=n_critics,
        lstm_sizes=(16,),
        pre_mlp_sizes=(16,),
        post_mlp_sizes=(16,),
        ff_mlp_sizes=(16,),
    )


def _random_recurrent_inputs(rng, t, b, obs_dim, act_dim):
    from seed_rl_tpu.types import EnvOutput

    keys = jax.random.split(rng, 4)
    obs = jax.random.normal(keys[0], (t, b, obs_dim))
    done = jax.random.bernoulli(keys[1], 0.3, (t, b))
    prev_action = jax.random.normal(keys[2], (t, b, act_dim))
    env_outputs = EnvOutput(
        reward=jnp.zeros((t, b)),
        done=done,
        observation=obs,
        abandoned=jnp.zeros((t, b), bool),
        episode_step=jnp.zeros((t, b), jnp.int32),
    )
    return prev_action, env_outputs


def test_recurrent_sac_step_matches_time_major_unroll():
    """step() T times == one time-major get_* pass (shared params + resets)."""
    t, b, obs_dim, act_dim = 5, 3, 4, 2
    dist = pd.NormalTanhDistribution(act_dim)
    net = _make_recurrent_net(dist)
    prev_action, env_outputs = _random_recurrent_inputs(
        jax.random.PRNGKey(1), t, b, obs_dim, act_dim
    )
    step0 = jax.tree.map(lambda x: x[0], (prev_action, env_outputs))
    params = net.init(
        jax.random.PRNGKey(0), step0[0], step0[1], net.initial_state(b)
    )

    # Sequential single-step path.
    state = net.initial_state(b)
    stepwise = []
    for i in range(t):
        pa, eo = jax.tree.map(lambda x: x[i], (prev_action, env_outputs))
        out, state = net.apply(params, pa, eo, state, method=net.step)
        stepwise.append(out)
    stepwise = jnp.stack(stepwise)

    # Time-major training path from the same initial state.
    time_major = net.apply(
        params, prev_action, env_outputs, net.initial_state(b),
        method=net.get_action_params,
    )
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(time_major), rtol=2e-5, atol=2e-5
    )

    # Q/V heads consume the same state tuple and produce [T, B, ...] outputs.
    v = net.apply(
        params, prev_action, env_outputs, net.initial_state(b),
        method=net.get_v,
    )
    q = net.apply(
        params, prev_action, env_outputs, net.initial_state(b),
        jnp.zeros((t, b, act_dim)), method=net.get_q,
    )
    assert v.shape == (t, b)
    assert q.shape == (t, b, 2)


def test_recurrent_sac_goalenv_withholds_desired_goal():
    """Changing desired_goal must not change the recurrent carry."""
    from seed_rl_tpu.types import EnvOutput

    b, n_bits = 3, 4
    dist = pd.CategoricalDistribution(n_bits + 1)
    net = _make_recurrent_net(dist, n_critics=1)
    rng = jax.random.PRNGKey(2)
    obs = {
        "achieved_goal": jax.random.normal(rng, (b, n_bits)),
        "desired_goal": jnp.zeros((b, n_bits)),
        "observation": jax.random.normal(rng, (b, 6)),
    }
    env_output = EnvOutput(
        reward=jnp.zeros((b,)),
        done=jnp.zeros((b,), bool),
        observation=obs,
        abandoned=jnp.zeros((b,), bool),
        episode_step=jnp.zeros((b,), jnp.int32),
    )
    prev_action = jnp.zeros((b, 1))
    params = net.init(
        jax.random.PRNGKey(0), prev_action, env_output, net.initial_state(b)
    )
    _, state_a = net.apply(
        params, prev_action, env_output, net.initial_state(b), method=net.step
    )
    shifted = env_output._replace(
        observation=dict(obs, desired_goal=jnp.ones((b, n_bits)))
    )
    out_b, state_b = net.apply(
        params, prev_action, shifted, net.initial_state(b), method=net.step
    )
    for la, lb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb))
    # ...but the feed-forward branch (actor output) does see the goal.
    out_a, _ = net.apply(
        params, prev_action, env_output, net.initial_state(b), method=net.step
    )
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_recurrent_sac_trains_end_to_end():
    num_envs = 8
    env = BatchedEnv(ToyEnv(horizon=3), num_envs)
    dist = pd.NormalTanhDistribution(3)
    net = _make_recurrent_net(dist)
    agent = sac.SACAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length=4)
    config = sac.SACConfig(
        discounting=0.9,
        entropy_cost=0.05,
        batch_size=16,
        replay_buffer_size=256,
        replay_buffer_min_size=32,
        unroll_length=4,
        polyak=0.95,
    )
    learner = sac.SACLearner(engine, agent, config, optax.adam(1e-3))
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    state, metrics = jax.jit(learner.train_step)(state)
    assert np.isfinite(float(metrics["losses/total"]))
    # Recurrent carries ride the stored unrolls: state tuple per net.
    assert len(state.rollout.agent_state) == 4  # actor, v, q0, q1
