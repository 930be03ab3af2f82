"""Observation-normalizer tests (reference common/normalizer.py semantics).

Ground-truth math: after updates with batches B1..Bk, mean = E[x] and
std = sqrt(E[x^2] - E[x]^2) over all rows seen; normalization is
clip((x - mean)/(std + eps), -5, 5). Also covers the agent wrappers for
V-trace and SAC (stats ride the param tree, folded once per step).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu.ops import normalizer as on
from seed_rl_tpu.types import EnvOutput


def test_normalizer_matches_numpy_ground_truth():
    rng = np.random.RandomState(0)
    state = on.init(3)
    seen = []
    for _ in range(4):
        batch = rng.randn(7, 3).astype(np.float32) * 2.0 + 1.0
        seen.append(batch)
        state = on.update(state, jnp.asarray(batch))
    all_rows = np.concatenate(seen, axis=0)
    np.testing.assert_allclose(
        np.asarray(state.mean), all_rows.mean(0), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.std), all_rows.std(0), rtol=1e-4, atol=1e-4
    )
    x = rng.randn(5, 3).astype(np.float32)
    got = np.asarray(on.normalize(state, jnp.asarray(x)))
    want = np.clip(
        (x - all_rows.mean(0)) / (all_rows.std(0) + 0.001), -5, 5
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_normalizer_handles_multirank_batches():
    state = on.init(2)
    batch = jnp.arange(24, dtype=jnp.float32).reshape(3, 4, 2)
    state = on.update(state, batch)
    assert float(state.steps) == 12.0
    flat = np.arange(24, dtype=np.float32).reshape(12, 2)
    np.testing.assert_allclose(np.asarray(state.mean), flat.mean(0), rtol=1e-6)


def test_normalizer_initial_state_clips_raw_inputs():
    # Before any update mean=std=0: output = clip(x/eps) = +-5 for |x|>>0.
    state = on.init(1)
    out = on.normalize(state, jnp.asarray([[3.0], [-3.0], [0.0]]))
    np.testing.assert_allclose(np.asarray(out)[:, 0], [5.0, -5.0, 0.0])


def test_normalize_observation_dict_concat_split():
    state = on.init(5)
    state = on.update(state, jax.random.normal(jax.random.PRNGKey(0), (100, 5)))
    obs = {
        "a": jnp.ones((4, 2)),
        "b": jnp.zeros((4, 3)),
    }
    normalized = on.normalize_observation(state, obs)
    assert normalized["a"].shape == (4, 2)
    assert normalized["b"].shape == (4, 3)
    concat = jnp.concatenate([obs["a"], obs["b"]], axis=-1)
    want = on.normalize(state, concat)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([normalized["a"], normalized["b"]], -1)),
        np.asarray(want),
    )


def test_normalizer_stats_not_differentiated():
    state = on.init(2)
    state = on.update(state, jnp.ones((10, 2)) * 3.0)

    def f(mean):
        s = state._replace(mean=mean)
        return jnp.sum(on.normalize(s, jnp.ones((1, 2))))

    grads = jax.grad(f)(state.mean)
    np.testing.assert_array_equal(np.asarray(grads), 0.0)


def test_vtrace_normalizing_agent_trains_and_updates_stats():
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import NormalizingObservationsAgent, PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.envs import BatchedEnv, ToyEnv
    from seed_rl_tpu.models import MLPAndLSTM
    from seed_rl_tpu.rollout import RolloutEngine

    env = BatchedEnv(ToyEnv(horizon=3), 8)
    dist = pd.NormalTanhDistribution(3)
    net = MLPAndLSTM(
        parametric_distribution_param_size=dist.param_size,
        mlp_sizes=(16,), lstm_sizes=(8,),
    )
    agent = NormalizingObservationsAgent(PolicyAgent(net, dist))
    engine = RolloutEngine(env, agent, unroll_length=4)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(discounting=0.9),
        optax.adam(1e-3),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    assert float(state.params["net"]["obs_norm"].steps) == 0.0
    state, metrics = jax.jit(learner.train_step)(state)
    # One step folded the full (T+1)*B training unroll into the statistics
    # (the reference folds every observation the training forward sees).
    assert float(state.params["net"]["obs_norm"].steps) == 5 * 8
    assert np.isfinite(float(metrics["losses/total"]))
    state, _ = jax.jit(learner.train_step)(state)
    assert float(state.params["net"]["obs_norm"].steps) == 2 * 5 * 8


def test_sac_normalizing_agent_trains():
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agents import sac
    from seed_rl_tpu.envs import BatchedEnv, ToyEnv
    from seed_rl_tpu.models.sac_nets import ActorCriticMLP
    from seed_rl_tpu.rollout import RolloutEngine

    env = BatchedEnv(ToyEnv(horizon=3), 8)
    dist = pd.NormalTanhDistribution(3)
    net = ActorCriticMLP(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2, mlp_sizes=(32,),
    )
    agent = sac.SACAgent(net, dist, normalize_observations=True)
    engine = RolloutEngine(env, agent, unroll_length=1)
    config = sac.SACConfig(
        batch_size=16, replay_buffer_size=256, replay_buffer_min_size=32,
        unroll_length=1,
    )
    learner = sac.SACLearner(engine, agent, config, optax.adam(1e-3))
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    assert float(state.params["net"]["obs_norm"].steps) > 0
    state, metrics = jax.jit(learner.train_step)(state)
    assert np.isfinite(float(metrics["losses/total"]))
    # Target-net tree includes a (drifting) copy of the stats.
    assert "obs_norm" in state.target_net_params


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
