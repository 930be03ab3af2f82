"""--debug_asserts: on-device contract checks in the fused paths.

SURVEY §5 race-detection row: the reference keeps host-side runtime
assertions (duplicate env ids, single-writer replay); the fused on-device
design needs checkify-based equivalents, compiled out unless enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seed_rl_tpu.replay import PrioritizedReplay
from seed_rl_tpu.utils import debug_asserts


@pytest.fixture
def asserts_enabled():
    debug_asserts.enable(True)
    yield
    debug_asserts.enable(False)


def _replay_and_state():
    replay = PrioritizedReplay(8, importance_sampling_exponent=0.6)
    state = replay.init_state({"x": jnp.zeros((3,), jnp.float32)})
    return replay, state


def test_checks_compile_out_when_disabled():
    """Off (the default): corrupted inputs pass silently — the checks add
    literally nothing to the compiled program."""
    assert not debug_asserts.enabled()
    replay, state = _replay_and_state()
    bad = jnp.array([jnp.nan, 1.0])
    step = debug_asserts.checkify_jit(
        lambda s: replay.insert(s, {"x": jnp.zeros((2, 3))}, bad)[0]
    )
    out = step(state)  # no error machinery at all
    assert int(out.num_inserted) == 2


def test_nan_priority_insert_trips_check(asserts_enabled):
    replay, state = _replay_and_state()
    bad = jnp.array([jnp.nan, 1.0])
    step = debug_asserts.checkify_jit(
        lambda s: replay.insert(s, {"x": jnp.zeros((2, 3))}, bad)[0]
    )
    with pytest.raises(Exception, match="finite"):
        step(state)


def test_empty_buffer_sample_trips_check(asserts_enabled):
    replay, state = _replay_and_state()
    sample = debug_asserts.checkify_jit(
        lambda s, r: replay.sample(s, r, 4, priority_exp=0.9)[0]
    )
    with pytest.raises(Exception, match="empty"):
        sample(state, jax.random.PRNGKey(0))


def test_plain_jit_with_asserts_enabled_does_not_raise(asserts_enabled):
    """ADVICE r4 (medium): a plain ``jax.jit`` (DistributedLearner
    multichip path, --run_mode=profile) tracing an ENABLED contract check
    must degrade to a warning, not crash at trace/lowering time."""
    replay, state = _replay_and_state()
    bad = jnp.array([jnp.nan, 1.0])
    step = jax.jit(  # plain jit, NOT checkify_jit
        lambda s: replay.insert(s, {"x": jnp.zeros((2, 3))}, bad)[0]
    )
    out = step(state)  # check is skipped there; no trace-time ValueError
    assert int(out.num_inserted) == 2

    # ...and the checkified path in the SAME process still catches it.
    checked = debug_asserts.checkify_jit(
        lambda s: replay.insert(s, {"x": jnp.zeros((2, 3))}, bad)[0]
    )
    with pytest.raises(Exception, match="finite"):
        checked(state)


def test_valid_path_passes_with_asserts_on(asserts_enabled):
    """A healthy fused R2D2 train step runs clean under --debug_asserts
    (the CI exercise of the mode end-to-end)."""
    from seed_rl_tpu.agents import r2d2
    from seed_rl_tpu.envs import BatchedEnv, DiscreteMatchEnv
    from seed_rl_tpu.models.dueling_mlp import VectorDuelingDQNNet
    from seed_rl_tpu.rollout import RolloutEngine

    env = BatchedEnv(DiscreteMatchEnv(n_actions=4, horizon=10), 8)
    net = VectorDuelingDQNNet(
        num_actions=4, mlp_sizes=(16,), lstm_size=8, hidden_size=16
    )
    agent = r2d2.R2D2Agent(net, r2d2.training_env_epsilons(8))
    engine = RolloutEngine(env, agent, 6, num_overlapping_steps=2)
    config = r2d2.R2D2Config(
        burn_in=2, n_steps=2, batch_size=4,
        replay_buffer_size=64, replay_buffer_min_size=8,
    )
    learner = r2d2.R2D2Learner(engine, agent, config, optax.adam(1e-3))
    state = debug_asserts.checkify_jit(learner.init)(jax.random.PRNGKey(0))
    warmup = debug_asserts.checkify_jit(learner.warmup_step)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    step = debug_asserts.checkify_jit(learner.train_step)
    state, logs = step(state)
    assert np.isfinite(float(logs["losses/td"]))

    # Corrupting the replay priorities (as a bug in a custom composition
    # might) is caught by the next sampled batch instead of silently
    # skewing the sampler.
    corrupted = state._replace(
        replay=state.replay._replace(
            priorities=state.replay.priorities.at[0].set(jnp.nan)
        )
    )
    with pytest.raises(Exception, match="finite|nan|NaN"):
        # The insert of the next step writes fine priorities, but the
        # train step also re-inserts and samples; the NaN propagates into
        # the update_priorities contract via sampled batches. Use a
        # direct insert with NaN to keep the repro deterministic.
        debug_asserts.checkify_jit(
            lambda s: learner.replay.insert(
                s.replay,
                jax.tree.map(
                    lambda b: b[:1].reshape(
                        (1,) + b.shape[1:]
                    ),
                    s.replay.buffer,
                ),
                jnp.array([jnp.nan]),
            )[0]
        )(corrupted)


import pytest as _pytest_tiering  # noqa: E402

pytestmark = _pytest_tiering.mark.critical
