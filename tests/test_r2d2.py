"""R2D2 learner tests: burn-in, epsilon ladder, warmup, learning.

Learning test: DiscreteMatchEnv (observe one-hot target, Q-learning should
reach near-1 reward/step). Mirrors the reference's R2D2 structure at toy
scale: burn-in overlap, prioritized replay, target network.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.agents import r2d2
from seed_rl_tpu.envs import BatchedEnv, DiscreteMatchEnv
from seed_rl_tpu.models.dueling_mlp import VectorDuelingDQNNet
from seed_rl_tpu.rollout import RolloutEngine
from seed_rl_tpu.utils import episode_stats


def _make_learner(
    num_envs=16,
    num_eval_envs=2,
    unroll_length=6,
    burn_in=2,
    batch_size=16,
    buffer_size=256,
    min_size=32,
    target_update=20,
    target="nstep",
):
    env = BatchedEnv(DiscreteMatchEnv(n_actions=4, horizon=10), num_envs)
    net = VectorDuelingDQNNet(
        num_actions=4, mlp_sizes=(32,), lstm_size=16, hidden_size=32
    )
    num_training = num_envs - num_eval_envs
    epsilons = jnp.concatenate(
        [
            r2d2.training_env_epsilons(num_training),
            jnp.full((num_eval_envs,), 1e-3),
        ]
    )
    agent = r2d2.R2D2Agent(net, epsilons)
    engine = RolloutEngine(
        env, agent, unroll_length, num_overlapping_steps=burn_in
    )
    config = r2d2.R2D2Config(
        discounting=0.9,
        n_steps=3,
        burn_in=burn_in,
        replay_buffer_size=buffer_size,
        replay_buffer_min_size=min_size,
        batch_size=batch_size,
        update_target_every_n_step=target_update,
        num_eval_envs=num_eval_envs,
        target=target,
    )
    return r2d2.R2D2Learner(
        engine,
        agent,
        config,
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(1e-3)),
    )


def test_epsilon_ladder_matches_reference():
    eps = np.asarray(r2d2.training_env_epsilons(5))
    want = 0.4 ** np.linspace(1.0, 8.0, 5)
    np.testing.assert_allclose(eps, want, rtol=1e-5)


def test_initial_priorities_use_retrace_kernel_when_configured():
    """ADVICE r4: with target='retrace', insertion priorities must come
    from the Retrace error metric, not the n-step TD kernel, so early
    sampling matches the post-training priority updates."""
    from seed_rl_tpu.ops import value_ops

    nstep = _make_learner(target="nstep")
    retr = _make_learner(target="retrace")
    state = jax.jit(nstep.warmup_step)(jax.jit(nstep.init)(
        jax.random.PRNGKey(0)
    ))

    # Pull the just-inserted unrolls back out of the buffer and compare
    # both kernels' priorities for them.
    _, _, items = nstep.replay.sample(
        state.replay, jax.random.PRNGKey(1), 8,
        nstep.config.priority_exponent,
    )
    p_nstep = r2d2.initial_priorities(nstep.config, items)
    p_retr = r2d2.initial_priorities(retr.config, items)
    assert p_nstep.shape == p_retr.shape
    assert not np.allclose(np.asarray(p_nstep), np.asarray(p_retr))

    # And the retrace path is exactly the behaviour-only retrace kernel.
    tm = jax.tree.map(
        lambda t: jnp.swapaxes(t, 0, 1),
        (items.env_outputs, items.agent_outputs),
    )
    env_sfx, agent_sfx = jax.tree.map(
        lambda t: t[retr.config.burn_in:], tm
    )
    _, want = value_ops.retrace_loss_and_priorities(
        agent_sfx.q_values,
        agent_sfx.q_values,
        agent_sfx.action,
        agent_sfx.action,
        env_sfx.reward,
        env_sfx.done,
        gamma=retr.config.discounting,
        lambda_=retr.config.retrace_lambda,
        rescaling_eps=retr.config.value_function_rescaling_epsilon,
    )
    np.testing.assert_allclose(
        np.asarray(p_retr), np.asarray(want), rtol=1e-6
    )


def test_warmup_fills_buffer_training_envs_only():
    learner = _make_learner(num_envs=8, num_eval_envs=2)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    assert int(state.replay.num_inserted) == 0
    state = jax.jit(learner.warmup_step)(state)
    # Only the 6 training envs insert unrolls.
    assert int(state.replay.num_inserted) == 6


def test_train_step_updates_priorities_and_params():
    learner = _make_learner(num_envs=8, num_eval_envs=0, min_size=4,
                            batch_size=4)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state = jax.jit(learner.warmup_step)(state)
    params_before = jax.tree.leaves(state.params)[0].copy()
    state, logs = jax.jit(learner.train_step)(state)
    assert int(state.step) == 1
    assert np.isfinite(float(logs["losses/td"]))
    assert not np.allclose(
        np.asarray(params_before), np.asarray(jax.tree.leaves(state.params)[0])
    )


def test_fused_replay_state_in_checkpoint(tmp_path):
    """The fused path's ReplayState rides the Orbax checkpoint: a restore
    resumes with the exact buffer contents, priorities and cursors (the
    reference loses its replay on restart — gcp/train_atari.sh:28-33)."""
    from seed_rl_tpu.utils.checkpoint import CheckpointManager

    learner = _make_learner(num_envs=8, num_eval_envs=0, min_size=4,
                            batch_size=4)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state = jax.jit(learner.warmup_step)(state)
    state, _ = jax.jit(learner.train_step)(state)

    ckpt = CheckpointManager(str(tmp_path), save_checkpoint_secs=0.0)
    assert ckpt.maybe_save(int(state.step), state)
    ckpt.close()

    fresh = jax.jit(learner.init)(jax.random.PRNGKey(7))
    assert int(fresh.replay.num_inserted) == 0
    ckpt2 = CheckpointManager(str(tmp_path))
    restored = ckpt2.restore_or(fresh)
    ckpt2.close()
    assert int(restored.replay.num_inserted) == int(
        state.replay.num_inserted
    )
    for got, want in zip(
        jax.tree.leaves(restored.replay), jax.tree.leaves(state.replay)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # Training continues from the restored buffer without a warmup refill.
    restored2, logs = jax.jit(learner.train_step)(restored)
    assert int(restored2.step) == int(state.step) + 1
    assert np.isfinite(float(logs["losses/td"]))


def test_target_network_updates_on_schedule():
    learner = _make_learner(
        num_envs=8, num_eval_envs=0, min_size=4, batch_size=4, target_update=2
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state = jax.jit(learner.warmup_step)(state)
    step = jax.jit(learner.train_step)
    state, _ = step(state)  # step 1: no target update
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params,
        state.target_params,
    )
    assert max(jax.tree.leaves(diff)) > 0
    state, _ = step(state)  # step 2: target <- online
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params,
        state.target_params,
    )
    assert max(jax.tree.leaves(diff)) == 0


def test_r2d2_retrace_learns_discrete_match():
    """R2D2 with Retrace(lambda) targets (--target=retrace) learns the
    same toy task the n-step test pins — the north-star capability the
    reference lacks (its r2d2 ships n-step only, learner.py:195-255)."""
    learner = _make_learner(
        num_envs=32,
        num_eval_envs=4,
        unroll_length=6,
        burn_in=2,
        batch_size=32,
        buffer_size=512,
        min_size=64,
        target_update=25,
        target="retrace",
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(3))
    warmup = jax.jit(learner.warmup_step)
    while (
        int(state.replay.num_inserted)
        < learner.config.replay_buffer_min_size
    ):
        state = warmup(state)
    run = jax.jit(lambda s: learner.train_many(s, 25))
    state, _ = run(state)
    early = float(state.stats.sum_return) / max(
        float(state.stats.num_episodes), 1.0
    )
    state = state._replace(
        stats=episode_stats.reset_window(state.stats),
        eval_stats=episode_stats.reset_window(state.eval_stats),
    )
    for _ in range(11):
        state, logs = run(state)
    late = float(state.stats.sum_return) / float(state.stats.num_episodes)
    assert np.isfinite(float(logs["losses/td"]))
    assert late > early + 2.0, (early, late)


def test_r2d2_learns_discrete_match():
    learner = _make_learner(
        num_envs=32,
        num_eval_envs=4,
        unroll_length=6,
        burn_in=2,
        batch_size=32,
        buffer_size=512,
        min_size=64,
        target_update=25,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < learner.config.replay_buffer_min_size:
        state = warmup(state)

    run = jax.jit(lambda s: learner.train_many(s, 25))
    state, _ = run(state)
    early = float(state.stats.sum_return) / max(
        float(state.stats.num_episodes), 1.0
    )
    state = state._replace(
        stats=episode_stats.reset_window(state.stats),
        eval_stats=episode_stats.reset_window(state.eval_stats),
    )
    for _ in range(11):
        state, logs = run(state)
    late = float(state.stats.sum_return) / float(state.stats.num_episodes)
    # Measure eval on a fresh window at the end (the cumulative window would
    # average in the early untrained episodes).
    state = state._replace(
        eval_stats=episode_stats.reset_window(state.eval_stats)
    )
    for _ in range(2):
        state, logs = run(state)
    eval_return = float(state.eval_stats.sum_return) / float(
        state.eval_stats.num_episodes
    )
    # Horizon 10, optimal return 10; random ~2.5. Epsilon ladder caps the
    # training return; eval envs (epsilon 1e-3) should approach optimal.
    assert late > early + 2.0, (early, late)
    assert eval_return > 8.0, eval_return
