"""Aux-subsystem tests: action points, in-memory snapshots, timers, and
inference-stage profiling early returns.

Mirrors reference behaviors: PPO linspace action points
(policy_gradient/learner.py:436-471), LearnerState warm start (:587-615,
:666-679), ExportingTimer windows (common/profiling.py:42-76) and
--profile_inference_return stages (learner_config.py:24-29).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu.utils.action_points import (
    ActionPointSchedule,
    snapshot_ppo_state,
    restore_ppo_state,
)
from seed_rl_tpu.utils.profiling import ExportingTimer, InferenceReturn


def test_action_point_schedule_fires_each_mark_once():
    sched = ActionPointSchedule(
        1000, {"checkpoint": 4, "saved_model": 2, "snapshot": 0}
    )
    fired = []
    for frames in [100, 250, 250, 400, 500, 600, 990, 1000]:
        for a in sched.due(frames):
            fired.append((frames, a))
    # checkpoint marks: 250, 500, 750, 1000; saved_model marks: 500, 1000.
    assert fired == [
        (250, "checkpoint"),
        (500, "checkpoint"),
        (500, "saved_model"),
        (990, "checkpoint"),
        (1000, "checkpoint"),
        (1000, "saved_model"),
    ]


def test_action_point_schedule_fires_per_jumped_mark():
    sched = ActionPointSchedule(100, {"checkpoint": 10})
    # Marks 10..90 crossed in one jump -> one firing per mark, so the
    # requested count is honoured.
    assert sched.due(95) == ["checkpoint"] * 9
    assert sched.due(100) == ["checkpoint"]
    assert sched.due(100000) == []


def test_exporting_timer_windowed_average():
    exported = []
    timer = ExportingTimer("t", 3, lambda name, avg: exported.append((name, avg)))
    for _ in range(7):
        with timer:
            pass
    assert len(exported) == 2  # two complete windows of 3
    assert all(name == "t" and avg >= 0 for name, avg in exported)
    assert timer.last_average == exported[-1][1]


def _tiny_ppo_learner():
    from test_ppo_learner import _make_ppo_learner

    return _make_ppo_learner(
        num_envs=8,
        unroll_length=4,
        epochs_per_step=1,
        batches_per_step=2,
    )


def test_ppo_snapshot_restore_round_trip():
    learner = _tiny_ppo_learner()
    state0 = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state1, _ = jax.jit(learner.train_step)(state0)
    snap = snapshot_ppo_state(state1, frames=32)
    assert snap.frames == 32
    # Snapshot leaves are host numpy copies.
    assert all(
        isinstance(leaf, np.ndarray)
        for leaf in jax.tree.leaves(snap.params)
    )
    # Warm-start a fresh state from the snapshot: trained variables carried
    # over, rollout state untouched.
    fresh = jax.jit(learner.init)(jax.random.PRNGKey(7))
    warm = restore_ppo_state(fresh, snap)
    for a, b in zip(
        jax.tree.leaves(warm.params), jax.tree.leaves(state1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(warm.step) == int(state1.step)
    for a, b in zip(
        jax.tree.leaves(warm.rollout.env_state),
        jax.tree.leaves(fresh.rollout.env_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The warm-started learner trains on.
    state2, metrics = jax.jit(learner.train_step)(warm)
    assert int(state2.step) == int(state1.step) + 1


def _make_bridge(profile_stage):
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.models.policy import MLPPolicyNetwork
    from seed_rl_tpu.runtime.actor import InferenceBridge
    from seed_rl_tpu.types import EnvOutput

    dist = pd.CategoricalDistribution(3)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(8,)
    )
    agent = PolicyAgent(net, dist)
    obs = jnp.zeros((4, 5), jnp.float32)
    env_output = EnvOutput(
        reward=jnp.zeros((4,)),
        done=jnp.zeros((4,), bool),
        observation=obs,
        abandoned=jnp.zeros((4,), bool),
        episode_step=jnp.zeros((4,), jnp.int32),
    )
    params = agent.init_params(
        jax.random.PRNGKey(0), jnp.zeros((4,), jnp.int32), env_output
    )
    # Timestep spec: (prev_action, env_output, agent_output) rows.
    from seed_rl_tpu.types import AgentOutput

    agent_out_spec = AgentOutput(
        action=jax.ShapeDtypeStruct((), jnp.int32),
        policy_logits=jax.ShapeDtypeStruct((3,), jnp.float32),
        baseline=jax.ShapeDtypeStruct((), jnp.float32),
    )
    specs = (
        jax.ShapeDtypeStruct((), jnp.int32),  # prev_action
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), env_output
        ),
        agent_out_spec,
    )
    bridge = InferenceBridge(
        agent,
        lambda: params,
        num_envs=4,
        unroll_length=3,
        timestep_specs=specs,
        profile_inference_return=profile_stage,
    )
    return bridge, env_output


@pytest.mark.parametrize(
    "stage",
    [
        InferenceReturn.INSTANTLY,
        InferenceReturn.BEFORE_INFERENCE,
        InferenceReturn.AFTER_INFERENCE,
        InferenceReturn.AFTER_UNROLL,
        None,
    ],
)
def test_inference_bridge_profile_stages(stage):
    bridge, env_output = _make_bridge(stage)
    env_ids = np.arange(4)
    run_ids = np.ones((4,), np.int64)
    row_output = jax.tree.map(np.asarray, env_output)
    for _ in range(4):  # enough steps to complete an unroll at END
        (actions,) = bridge.handler(env_ids, (run_ids, row_output))
        assert actions.shape == (4,)
    if stage in (None,):
        # Full path: an unroll completed and reached the queue.
        assert not bridge.unroll_queue.empty()
    else:
        assert bridge.unroll_queue.empty()


def test_warm_start_restore_across_env_counts(tmp_path):
    """--init_checkpoint semantics: agent vars restored, env state fresh,
    works when num_envs differs from the source run."""
    from test_ppo_learner import _make_ppo_learner

    from seed_rl_tpu.utils.checkpoint import CheckpointManager, restore_from

    src = _make_ppo_learner(num_envs=8, unroll_length=4,
                            epochs_per_step=1, batches_per_step=2)
    state = jax.jit(src.init)(jax.random.PRNGKey(0))
    state, _ = jax.jit(src.train_step)(state)
    ckpt = CheckpointManager(str(tmp_path), save_checkpoint_secs=0.0)
    assert ckpt.maybe_save(int(state.step), state, force=True)
    ckpt.close()

    dst = _make_ppo_learner(num_envs=4, unroll_length=4,
                            epochs_per_step=1, batches_per_step=2)
    fresh = jax.jit(dst.init)(jax.random.PRNGKey(1))
    warm = restore_from(str(tmp_path), fresh)
    assert int(warm.step) == int(state.step)
    for a, b in zip(
        jax.tree.leaves(warm.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Env-bound state keeps the fresh 4-env shapes.
    assert jax.tree.leaves(warm.rollout.env_output)[0].shape[0] == 4
    # And training continues from the warm state.
    nxt, _ = jax.jit(dst.train_step)(warm)
    assert int(nxt.step) == int(state.step) + 1
