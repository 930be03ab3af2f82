"""Multi-device (8 virtual CPU devices) sharded-training tests.

The JAX analogue of the reference's simulated-two-device strategy tests
(modules/test_utils.py:76-108 + utils_test.py:609-650 cross-replica
minimize): the full V-trace train step runs as a global-array program over an
8-way mesh, envs sharded, params replicated, and must agree with the
single-device program.
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
from seed_rl_tpu.models import MLPPolicyNetwork
from seed_rl_tpu.parallel import DistributedLearner, make_mesh
from seed_rl_tpu.rollout import RolloutEngine


def _make_learner(num_envs):
    env = BatchedEnv(ToyEnv(horizon=3), num_envs)
    dist = pd.NormalTanhDistribution(3)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(16,)
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, 4)
    return vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(), optax.sgd(1e-2)
    )


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_distributed_matches_single_device():
    learner = _make_learner(num_envs=16)
    mesh = make_mesh(num_replicas=8)
    dist_learner = DistributedLearner(learner, mesh)

    rng = jax.random.PRNGKey(0)
    state_single = jax.jit(learner.init)(rng)
    state_dist = dist_learner.init(rng)

    # Same seed -> identical initial params & env states.
    for a, b in zip(
        jax.tree.leaves(state_single.params), jax.tree.leaves(state_dist.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    step_single = jax.jit(learner.train_step)
    for _ in range(3):
        state_single, m_single = step_single(state_single)
        state_dist, m_dist = dist_learner.train_step(state_dist)

    for a, b in zip(
        jax.tree.leaves(state_single.params), jax.tree.leaves(state_dist.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        float(m_single["losses/total"]),
        float(m_dist["losses/total"]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_distributed_state_is_actually_sharded():
    learner = _make_learner(num_envs=16)
    mesh = make_mesh(num_replicas=8)
    dist_learner = DistributedLearner(learner, mesh)
    state = dist_learner.init(jax.random.PRNGKey(0))

    # Env-batch leaves are sharded over 8 devices; params are replicated.
    return_acc = state.stats.return_acc
    assert len(return_acc.sharding.device_set) == 8
    assert not return_acc.sharding.is_fully_replicated
    param_leaf = jax.tree.leaves(state.params)[0]
    assert param_leaf.sharding.is_fully_replicated


def test_distributed_train_many():
    learner = _make_learner(num_envs=8)
    mesh = make_mesh(num_replicas=4, devices=jax.devices()[:4])
    dist_learner = DistributedLearner(learner, mesh)
    state = dist_learner.init(jax.random.PRNGKey(0))
    state, metrics = dist_learner.train_many(state, 5)
    assert int(state.step) == 5
    assert np.isfinite(float(metrics["losses/total"]))
