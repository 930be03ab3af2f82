"""Training driver for host-resident environments.

Drives any learner exposing ``init / rollout_params / update`` with a
``HostRolloutEngine``: the host collects an unroll (thread-pool env stepping
+ jitted policy), the jitted ``update`` trains on it. This is the
capability-parity path for the reference's actor→learner pipeline on real
gym/MuJoCo/ALE environments; pure-JAX envs use the fused learner loops
instead.
"""

import functools
from typing import Optional

import jax


def host_learner_loop(
    learner,
    host_engine,
    rng,
    total_environment_frames: int,
    logger=None,
    checkpoint=None,
    log_every_steps: int = 10,
    seed: int = 0,
    pipeline: bool = False,
):
    """Drives host envs + device training.

    With ``pipeline=True`` the unroll for step k+1 is collected — env
    thread pool + policy inference — concurrently with the device executing
    update k, using the params from step k (exactly the reference's
    concurrency: actors act on the params of the last completed minimize,
    and the losses consume the stored behaviour policy via importance
    weights). The default keeps strict on-policyness (rollout k+1 sees
    update k's params); enable pipelining when env stepping and device
    training are comparable costs.
    """
    from seed_rl_tpu.utils import episode_stats

    init_rng, rollout_rng, loop_rng = jax.random.split(rng, 3)
    state = learner.init(init_rng)
    if checkpoint is not None:
        state = checkpoint.restore_or(state)
    host_state = host_engine.init(learner.rollout_params(state), rollout_rng,
                                  seed=seed)
    update = jax.jit(learner.update)

    frames_per_step = learner.frames_per_step
    pending = None  # unroll awaiting training when pipelining
    while int(state.step) * frames_per_step < total_environment_frames:
        if pipeline:
            params = learner.rollout_params(state)
            if pending is None:
                host_state, pending = host_engine.rollout(params, host_state)
            # Dispatch the (async) device update for the collected unroll,
            # then immediately gather the next unroll with the pre-update
            # params — the host env stepping overlaps the device update.
            loop_rng, step_rng = jax.random.split(loop_rng)
            state, metrics = update(state, pending, step_rng)
            host_state, pending = host_engine.rollout(params, host_state)
        else:
            host_state, unroll = host_engine.rollout(
                learner.rollout_params(state), host_state
            )
            loop_rng, step_rng = jax.random.split(loop_rng)
            state, metrics = update(state, unroll, step_rng)
        step = int(state.step)
        if logger is not None and step % log_every_steps == 0:
            stats = state.stats
            n = float(stats.num_episodes)
            if n > 0:
                metrics = dict(metrics)
                metrics["episodes/mean_return"] = float(stats.sum_return) / n
                metrics["episodes/mean_length"] = float(stats.sum_length) / n
                state = state._replace(
                    stats=episode_stats.reset_window(stats)
                )
            logger.log(step, metrics, frames=step * frames_per_step)
        if checkpoint is not None:
            checkpoint.maybe_save(step, state)
    if pipeline and pending is not None:
        # Train on the final collected unroll instead of discarding the
        # already-paid-for env frames.
        loop_rng, step_rng = jax.random.split(loop_rng)
        state, _ = update(state, pending, step_rng)
    if checkpoint is not None:
        checkpoint.maybe_save(int(state.step), state, force=True)
    return state
