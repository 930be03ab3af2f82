"""Deterministic-policy evaluation harness.

Capability parity with the reference's eval modes:
- PPO ``run_eval`` (agents/policy_gradient/learner.py:473-514): reuse the
  env fleet with deterministic inference and unroll storage off, polling
  until enough episodes complete;
- the ``Evaluator`` episode aggregation (eval_utils.py:30-113): mean/std of
  returns/lengths over a window of completed episodes.

Works with either engine type. For on-device envs the whole eval loop is a
jitted rollout scan; episode statistics accumulate on device.
"""

from typing import Dict, Optional

import jax
import numpy as np

from seed_rl_tpu.utils import episode_stats


def run_eval(
    env,
    agent,
    params,
    rng,
    num_episodes: int,
    unroll_length: int = 32,
    max_rounds: int = 1000,
    host: bool = False,
) -> Dict[str, float]:
    """Runs deterministic inference until ``num_episodes`` complete.

    Args:
      env: a BatchedEnv (host=False) or HostBatchedEnv (host=True).
      agent: any agent exposing policy_step(..., deterministic=...).
      params: rollout params for the agent.
      rng: PRNG key.
      num_episodes: minimum completed episodes to aggregate.
      unroll_length: env steps per jitted chunk.
      max_rounds: safety bound on chunks.
      host: whether env is host-resident.

    Returns:
      dict with eval/num_episodes, eval/mean_return, eval/mean_length.
    """
    if host:
        from seed_rl_tpu.rollout_host import HostRolloutEngine

        engine = HostRolloutEngine(
            env, agent, unroll_length, deterministic=True
        )
    else:
        from seed_rl_tpu.rollout import RolloutEngine

        engine = RolloutEngine(
            env, agent, unroll_length, deterministic=True
        )

    init_rng, rollout_rng = jax.random.split(rng)
    state = engine.init(params, rollout_rng)
    stats = episode_stats.init(env.num_envs)

    if host:
        def chunk(params, state, stats):
            state, unroll = engine.rollout(params, state)
            new = jax.tree.map(lambda x: x[1:], unroll.timesteps.env_output)
            return state, episode_stats.update(stats, new)
    else:
        @jax.jit
        def chunk(params, state, stats):
            state, unroll = engine.rollout(params, state)
            new = jax.tree.map(lambda x: x[1:], unroll.timesteps.env_output)
            return state, episode_stats.update(stats, new)

    rounds = 0
    while float(stats.num_episodes) < num_episodes and rounds < max_rounds:
        state, stats = chunk(params, state, stats)
        rounds += 1

    n = max(float(stats.num_episodes), 1.0)
    return {
        "eval/num_episodes": float(stats.num_episodes),
        "eval/mean_return": float(stats.sum_return) / n,
        "eval/mean_length": float(stats.sum_length) / n,
    }
