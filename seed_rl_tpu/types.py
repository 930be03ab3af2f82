"""Core pytree types shared across the framework.

Behavioral contract mirrors the reference (see /root/reference):
- ``EnvOutput = (reward, done, observation, abandoned, episode_step)``
  (common/utils.py:41-42). ``observation`` is the observation *after* the
  transition; when ``done`` is set it is the first observation of the next
  episode (post-reset), matching common/utils.py:39-40.
- Agent call contract: ``agent(prev_actions, env_outputs, core_state, unroll,
  is_training) -> (AgentOutput, new_state)`` with time-major ``[T+1, B]``
  unrolls where step ``T`` is bootstrap-only (agents/vtrace/learner.py:84-88).
- ``AgentOutput`` variants: ``(action, policy_logits, baseline)`` for policy
  agents (agents/vtrace/networks.py) and ``(action, q_values)`` for R2D2
  (atari/networks.py:22).

Everything here is a plain ``NamedTuple`` so it is automatically a JAX pytree
with static structure, which keeps every train/rollout step trace-stable.
"""

from typing import Any, NamedTuple

import jax.numpy as jnp


class EnvOutput(NamedTuple):
    """One environment transition, batched and/or time-major stacked.

    Attributes:
      reward: f32[...] reward obtained by the *previous* action.
      done: bool[...] whether the episode ended with the previous action
        (terminated OR abandoned).
      observation: pytree of arrays — post-transition observation (post-reset
        when done).
      abandoned: bool[...] episode was cut (e.g. TimeLimit) rather than
        properly terminated; used by abandoned-aware advantage estimators.
      episode_step: i32[...] number of steps in the current episode.
    """

    reward: Any
    done: Any
    observation: Any
    abandoned: Any
    episode_step: Any


class AgentOutput(NamedTuple):
    """Policy-agent output (V-trace / PPO / SAC actors)."""

    action: Any
    policy_logits: Any
    baseline: Any


class QAgentOutput(NamedTuple):
    """Q-agent output (R2D2)."""

    action: Any
    q_values: Any


def zeros_like_spec(spec, batch_shape=()):
    """Build a zero pytree from a (shape, dtype) spec pytree."""
    import jax

    return jax.tree.map(
        lambda s: jnp.zeros(tuple(batch_shape) + tuple(s.shape), s.dtype), spec
    )
