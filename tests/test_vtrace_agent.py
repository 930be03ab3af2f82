"""End-to-end V-trace learning test on ToyEnv.

The reference never automated a learning test (SURVEY.md §4 notes this gap);
here the PR-1 reference config (BASELINE.json: toy env + V-trace + MLP) must
demonstrably improve its return, and the learner loop must round-trip through
checkpointing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.agents import vtrace as vtrace_agent
from seed_rl_tpu.envs import BatchedEnv, ToyEnv
from seed_rl_tpu.models import MLPPolicyNetwork, MLPAndLSTM
from seed_rl_tpu.rollout import RolloutEngine


def _make_learner(num_envs=64, unroll_length=10, lstm=False):
    env = BatchedEnv(ToyEnv(horizon=3), num_envs)
    dist = pd.NormalTanhDistribution(3)
    if lstm:
        net = MLPAndLSTM(
            parametric_distribution_param_size=dist.param_size,
            mlp_sizes=(32,),
            lstm_sizes=(16,),
        )
    else:
        net = MLPPolicyNetwork(
            parametric_distribution_param_size=dist.param_size,
            mlp_sizes=(32, 32),
        )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length)
    config = vtrace_agent.VTraceConfig(
        discounting=0.9, entropy_cost=1e-3, lambda_=1.0
    )
    learner = vtrace_agent.VTraceLearner(
        engine, agent, config, optax.adam(3e-3)
    )
    return learner


def _mean_return(state):
    n = float(state.stats.num_episodes)
    assert n > 0
    return float(state.stats.sum_return) / n


def test_vtrace_learns_toy_env():
    learner = _make_learner()
    state = learner.init(jax.random.PRNGKey(0))

    run = jax.jit(lambda s: learner.train_many(s, 50))
    state, _ = run(state)
    early_return = _mean_return(state)
    from seed_rl_tpu.utils import episode_stats

    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(7):
        state, metrics = run(state)
    late_return = _mean_return(state)

    # ToyEnv optimum is ~0; random ~ -2 per step. Require clear learning.
    assert late_return > early_return + 1.0, (early_return, late_return)
    assert late_return > -2.0, late_return
    assert np.isfinite(float(metrics["losses/total"]))


def test_vtrace_learner_loop_with_checkpoint(tmp_path):
    from seed_rl_tpu.utils.checkpoint import CheckpointManager
    from seed_rl_tpu.utils.metrics import MetricsLogger

    learner = _make_learner(num_envs=8, unroll_length=5)
    ckpt = CheckpointManager(str(tmp_path), save_checkpoint_secs=1e9)
    logger = MetricsLogger(logdir=str(tmp_path / "tb"))
    state = vtrace_agent.learner_loop(
        learner,
        jax.random.PRNGKey(0),
        total_environment_frames=8 * 5 * 4,  # 4 steps
        logger=logger,
        checkpoint=ckpt,
        steps_per_call=2,
    )
    assert int(state.step) == 4
    ckpt.close()

    # Resume restores the step counter.
    ckpt2 = CheckpointManager(str(tmp_path), save_checkpoint_secs=1e9)
    state2 = learner.init(jax.random.PRNGKey(1))
    state2 = ckpt2.restore_or(state2)
    assert int(state2.step) == 4
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    ckpt2.close()


def test_checkpoint_legacy_torso_scope_migrates(tmp_path):
    """ADVICE r4: checkpoints saved before the ImpalaDeep torso scope was
    pinned to "torso" stored the flax auto-name "ImpalaResNetTorso_0";
    restore_or must remap instead of failing on the mismatched tree."""
    from typing import NamedTuple

    from seed_rl_tpu.utils.checkpoint import CheckpointManager

    class S(NamedTuple):
        params: dict
        step: jnp.ndarray

    w = jnp.arange(6.0).reshape(2, 3)
    old = S(
        params={"ImpalaResNetTorso_0": {"Conv_0": {"kernel": w}}},
        step=jnp.asarray(3),
    )
    ckpt = CheckpointManager(str(tmp_path), save_checkpoint_secs=1e9)
    assert ckpt.maybe_save(3, old, force=True)
    ckpt.close()

    new_template = S(
        params={"torso": {"Conv_0": {"kernel": jnp.zeros((2, 3))}}},
        step=jnp.asarray(0),
    )
    ckpt2 = CheckpointManager(str(tmp_path), save_checkpoint_secs=1e9)
    restored = ckpt2.restore_or(new_template)
    ckpt2.close()
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["torso"]["Conv_0"]["kernel"]),
        np.asarray(w),
    )


def test_vtrace_lstm_variant_trains_one_step():
    learner = _make_learner(num_envs=8, unroll_length=6, lstm=True)
    state = learner.init(jax.random.PRNGKey(0))
    state, metrics = jax.jit(learner.train_step)(state)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["losses/total"]))
