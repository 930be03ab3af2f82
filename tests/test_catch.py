"""CatchEnv: on-device visual control with real credit assignment.

Mechanics tests pin the game rules; the learning test demonstrates a
conv policy learning FROM PIXELS fully on device — the visual-RL
end-to-end evidence that synthetic frame envs cannot provide without ALE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seed_rl_tpu.envs import BatchedEnv
from seed_rl_tpu.envs.catch import CatchEnv


def test_catch_mechanics():
    env = CatchEnv(rows=5, cols=5, cell_pixels=2, balls_per_episode=2)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (10, 10, 1)
    # Ball starts at the top, paddle mid-bottom.
    assert int(state.ball_row) == 0
    assert int(state.paddle_col) == 2

    # Track the ball column and drive the paddle onto it: reward +1.
    step = jax.jit(env.step)
    for _ in range(4):  # ball reaches the bottom row after rows-1 steps
        target = int(state.ball_col)
        cur = int(state.paddle_col)
        action = jnp.asarray(np.sign(target - cur) + 1, jnp.int32)
        result = step(state, action)
        state = result.state
    assert float(result.reward) == 1.0
    assert not bool(result.terminated)  # 1 of 2 balls resolved

    # Miss the next ball deliberately: reward -1 and episode end.
    for _ in range(4):
        target = int(state.ball_col)
        cur = int(state.paddle_col)
        away = 0 if target >= cur else 2
        # Move away unless pinned at a wall next to the target.
        action = jnp.asarray(away, jnp.int32)
        result = step(state, action)
        state = result.state
    assert float(result.reward) == -1.0
    assert bool(result.terminated)


def test_catch_frame_renders_ball_and_paddle():
    env = CatchEnv(rows=5, cols=5, cell_pixels=3, balls_per_episode=1)
    state, obs = env.reset(jax.random.PRNGKey(1))
    obs = np.asarray(obs)[..., 0]
    # Exactly two cells lit (ball + paddle), each a 3x3 block of 255.
    assert (obs == 255).sum() == 2 * 9
    ball_c, paddle_c = int(state.ball_col), int(state.paddle_col)
    assert (obs[0:3, ball_c * 3:ball_c * 3 + 3] == 255).all()
    assert (obs[12:15, paddle_c * 3:paddle_c * 3 + 3] == 255).all()


def test_catch_vtrace_learns_from_pixels():
    """A conv+LSTM policy improves substantially on Catch from pixels —
    real visual credit assignment end-to-end on the device path."""
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.models.atari import AtariPolicyNet
    from seed_rl_tpu.rollout import RolloutEngine

    num_envs = 32
    env = BatchedEnv(
        CatchEnv(rows=6, cols=6, cell_pixels=6, balls_per_episode=3),
        num_envs,
    )
    dist = pd.CategoricalDistribution(3)
    net = AtariPolicyNet(
        parametric_distribution_param_size=dist.param_size,
        frame_shape=(36, 36),
        stack_size=2,
        lstm_size=32,
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length=10)
    learner = vtrace_agent.VTraceLearner(
        engine,
        agent,
        vtrace_agent.VTraceConfig(entropy_cost=0.01),
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(1e-3)),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    run = jax.jit(lambda s: learner.train_many(s, 10))

    def window_return(s):
        stats = s.stats
        n = float(stats.num_episodes)
        return float(stats.sum_return) / max(n, 1.0), n

    state, _ = run(state)
    early, n_early = window_return(state)
    assert n_early > 0
    import seed_rl_tpu.utils.episode_stats as episode_stats

    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(25):
        state, _ = run(state)
    late, n_late = window_return(state)
    assert n_late > 0
    # Random is ~ -3 + balls/cols * 6 ~= -2; optimal is +3. Require a
    # decisive improvement over the early window.
    assert late > early + 1.0, (early, late)
    assert late > 0.5, (early, late)


def test_continuous_catch_mechanics():
    """ContinuousCatchEnv: paddle velocity moves a float position; catch
    within catch_radius; same episode structure as CatchEnv (SAC's visual
    variant)."""
    from seed_rl_tpu.envs.catch import ContinuousCatchEnv

    env = ContinuousCatchEnv(rows=5, cols=5, cell_pixels=1,
                             balls_per_episode=2, max_speed=1.0)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (5, 5, 1)
    # Drive the paddle hard right for one step: position moves by max_speed.
    p0 = float(state.paddle_pos)
    r = env.step(state, jnp.array([1.0]))
    assert abs(float(r.state.paddle_pos) - min(p0 + 1.0, 4.0)) < 1e-6
    # Run a full episode with a tracking policy: move toward the ball.
    state, _ = env.reset(jax.random.PRNGKey(1))
    total = 0.0
    for _ in range(20):
        delta = float(state.ball_col) - float(state.paddle_pos)
        action = jnp.array([np.clip(delta, -1.0, 1.0)])
        r = env.step(state, action)
        total += float(r.reward)
        state = r.state
        if bool(r.terminated):
            break
    # The tracker catches both balls (+2): 4 rows of fall at speed 1 always
    # reaches any column <= 4 cells away.
    assert total == 2.0, total


def test_visual_sac_shared_embedding_matches_per_head_torso():
    """The shared-embedding head path (one conv pass reused by actor/V/Q)
    must produce exactly the per-head-torso outputs — the r5 perf
    restructure may not change the math."""
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agents import sac
    from seed_rl_tpu.envs.catch import ContinuousCatchEnv
    from seed_rl_tpu.models.sac_nets import VisualActorCritic
    from seed_rl_tpu.types import EnvOutput

    env = BatchedEnv(ContinuousCatchEnv(rows=6, cols=6, cell_pixels=7), 3)
    dist = pd.get_parametric_distribution_for_action_space(env.action_space)
    net = VisualActorCritic(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2, head_sizes=(16,),
    )
    agent = sac.SACAgent(net, dist)
    assert agent.has_shared_embedding
    rng = jax.random.PRNGKey(0)
    _, env_output = env.reset(rng)
    prev_action = jnp.zeros((3, 1), jnp.float32)
    params = agent.init_params(rng, prev_action, env_output)
    state = ()
    action = jnp.full((3, 1), 0.3, jnp.float32)

    emb = agent.embed(params, prev_action, env_output, state)
    assert emb is not None
    np.testing.assert_allclose(
        np.asarray(agent.action_params(
            params, prev_action, env_output, state, embedding=emb)),
        np.asarray(agent.action_params(
            params, prev_action, env_output, state)),
    )
    np.testing.assert_allclose(
        np.asarray(agent.v(
            params, prev_action, env_output, state, embedding=emb)),
        np.asarray(agent.v(params, prev_action, env_output, state)),
    )
    np.testing.assert_allclose(
        np.asarray(agent.q(
            params, prev_action, env_output, state, action, embedding=emb)),
        np.asarray(agent.q(
            params, prev_action, env_output, state, action)),
    )


def test_visual_sac_forward_and_train_step():
    """VisualActorCritic plugs into the fused SACLearner over
    ContinuousCatchEnv frames (shapes + a finite train step)."""
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agents import sac
    from seed_rl_tpu.envs.catch import ContinuousCatchEnv
    from seed_rl_tpu.models.sac_nets import VisualActorCritic
    from seed_rl_tpu.rollout import RolloutEngine

    # Nature-DQN torso needs >= ~36px VALID-conv frames; use a 42x42
    # render (6x6 grid at 7px cells scaled by 7 -> 42).
    env = BatchedEnv(
        ContinuousCatchEnv(rows=6, cols=6, cell_pixels=7), 4
    )
    dist = pd.get_parametric_distribution_for_action_space(env.action_space)
    net = VisualActorCritic(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2,
        head_sizes=(32,),
    )
    agent = sac.SACAgent(net, dist)
    config = sac.SACConfig(
        batch_size=4, replay_buffer_size=32, replay_buffer_min_size=8,
        unroll_length=2,
    )
    engine = RolloutEngine(env, agent, 2)
    learner = sac.SACLearner(engine, agent, config, optax.adam(3e-4))
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    state, logs = jax.jit(learner.train_step)(state)
    assert np.isfinite(float(logs["losses/total"]))
    assert int(state.step) == 1
