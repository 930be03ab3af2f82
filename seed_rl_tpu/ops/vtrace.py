"""V-trace (IMPALA) actor-critic targets as a TPU-friendly backward scan.

Semantics match the reference implementation (/root/reference/common/vtrace.py:
from_importance_weights, lines 34-148): clipped importance weights rho/c, a
backward-in-time accumulation of temporal differences, and policy-gradient
advantages computed against the one-step-shifted v_s targets. The reference
unrolls the backward recursion as a Python loop over time; here it is a single
``jax.lax.scan`` (reverse=True) so XLA compiles one fused loop regardless of
unroll length.

See "IMPALA: Scalable Distributed Deep-RL with Importance Weighted
Actor-Learner Architectures", https://arxiv.org/abs/1802.01561.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class VTraceReturns(NamedTuple):
    vs: jnp.ndarray
    pg_advantages: jnp.ndarray


def from_importance_weights(
    target_action_log_probs: jnp.ndarray,
    behaviour_action_log_probs: jnp.ndarray,
    discounts: jnp.ndarray,
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    clip_rho_threshold: Optional[float] = 1.0,
    clip_pg_rho_threshold: Optional[float] = 1.0,
    lambda_: float = 1.0,
) -> VTraceReturns:
    """V-trace from log importance weights.

    Args:
      target_action_log_probs: f32[T, B] log pi(a|x) under the target policy.
      behaviour_action_log_probs: f32[T, B] log mu(a|x) under the behaviour
        policy.
      discounts: f32[T, B] discounts encountered when following mu (0 on
        episode end).
      rewards: f32[T, B] rewards following the behaviour policy.
      values: f32[T, B] value estimates wrt. the target policy.
      bootstrap_value: f32[B] value estimate at time T.
      clip_rho_threshold: rho-bar in the paper; None disables clipping.
      clip_pg_rho_threshold: clip for the policy-gradient rho; None disables.
      lambda_: mix between 1-step (0) and n-step (1) bootstrapping.

    Returns:
      VTraceReturns(vs=f32[T, B], pg_advantages=f32[T, B]); both have stopped
      gradients.
    """
    target_action_log_probs = jnp.asarray(target_action_log_probs, jnp.float32)
    behaviour_action_log_probs = jnp.asarray(
        behaviour_action_log_probs, jnp.float32
    )
    log_rhos = target_action_log_probs - behaviour_action_log_probs
    discounts = jnp.asarray(discounts, jnp.float32)
    rewards = jnp.asarray(rewards, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    bootstrap_value = jnp.asarray(bootstrap_value, jnp.float32)

    rhos = jnp.exp(log_rhos)
    if clip_rho_threshold is not None:
        clipped_rhos = jnp.minimum(clip_rho_threshold, rhos)
    else:
        clipped_rhos = rhos
    cs = lambda_ * jnp.minimum(1.0, rhos)

    # values shifted by one: [v_1, ..., v_T, bootstrap].
    values_t_plus_1 = jnp.concatenate(
        [values[1:], bootstrap_value[None]], axis=0
    )
    deltas = clipped_rhos * (rewards + discounts * values_t_plus_1 - values)

    def backward_step(acc, inputs):
        discount_t, c_t, delta_t = inputs
        acc = delta_t + discount_t * c_t * acc
        return acc, acc

    _, vs_minus_v_xs = jax.lax.scan(
        backward_step,
        jnp.zeros_like(bootstrap_value),
        (discounts, cs, deltas),
        reverse=True,
    )
    vs = vs_minus_v_xs + values

    vs_t_plus_1 = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    if clip_pg_rho_threshold is not None:
        clipped_pg_rhos = jnp.minimum(clip_pg_rho_threshold, rhos)
    else:
        clipped_pg_rhos = rhos
    pg_advantages = clipped_pg_rhos * (
        rewards + discounts * vs_t_plus_1 - values
    )

    return VTraceReturns(
        vs=jax.lax.stop_gradient(vs),
        pg_advantages=jax.lax.stop_gradient(pg_advantages),
    )
