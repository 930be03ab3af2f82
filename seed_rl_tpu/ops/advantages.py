"""Advantage estimators for the generalized on-policy loss.

Semantics match /root/reference/agents/policy_gradient/modules/advantages.py:
- ``vtrace``: V-trace with explicit done_terminated/done_abandoned handling
  (lines 28-108). Termination zeroes the next-step bootstrap; abandonment
  zeroes the temporal difference (so the advantage is zero and the target is
  the current value); neither propagates future TDs across episode ends.
- ``gae``: V-trace with zero log-rhos (lines 113-129).
- ``n_step``: n-step returns with abandoned-aware padding (lines 205-262).

All are pure functions over time-major ``[T(+1), B]`` arrays; the backward
recursions are ``lax.scan``s.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def vtrace(
    values: jnp.ndarray,
    rewards: jnp.ndarray,
    done_terminated: jnp.ndarray,
    done_abandoned: jnp.ndarray,
    discount_factor: float,
    target_action_log_probs: jnp.ndarray,
    behaviour_action_log_probs: jnp.ndarray,
    lambda_: float = 1.0,
    max_importance_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """V-trace value targets and advantages (abandoned-episode aware).

    Args:
      values: f32[T+1, B] value estimates for steps i..i+T.
      rewards: f32[T, B] rewards after actions at steps i..i+T-1.
      done_terminated: bool[T, B] episode properly terminated at that step.
      done_abandoned: bool[T, B] episode was abandoned (e.g. time limit).
      discount_factor: scalar discount.
      target_action_log_probs: f32[T, B].
      behaviour_action_log_probs: f32[T, B].
      lambda_: 1-step (0) ... n-step (1) mixing.
      max_importance_weight: importance weights are clipped to this value.

    Returns:
      (targets f32[T, B], advantages f32[T, B]) with stopped gradients.
    """
    values = jnp.asarray(values, jnp.float32)
    rewards = jnp.asarray(rewards, jnp.float32)

    log_rhos = target_action_log_probs - behaviour_action_log_probs
    log_rhos = jnp.minimum(log_rhos, jnp.log(max_importance_weight))
    rhos = jnp.exp(log_rhos)

    not_terminated = (~done_terminated).astype(jnp.float32)
    not_abandoned = (~done_abandoned).astype(jnp.float32)

    # Termination: zero the next-step bootstrap (value after reset belongs to
    # a different episode). Abandonment: zero the TD itself.
    next_step_bootstrap = not_terminated * values[1:]
    deltas = rewards + discount_factor * next_step_bootstrap - values[:-1]
    deltas = deltas * not_abandoned

    propagate_future = not_terminated * not_abandoned

    def backward_step(acc, inputs):
        delta_t, propagate_t, rho_t, value_t = inputs
        future = propagate_t * discount_factor * lambda_ * acc
        advantage_t = delta_t + future
        acc = rho_t * advantage_t
        target_t = value_t + acc
        return acc, (target_t, advantage_t)

    _, (targets, advantages) = jax.lax.scan(
        backward_step,
        jnp.zeros_like(values[0]),
        (deltas, propagate_future, rhos, values[:-1]),
        reverse=True,
    )
    return (
        jax.lax.stop_gradient(targets),
        jax.lax.stop_gradient(advantages),
    )


def gae(
    values: jnp.ndarray,
    rewards: jnp.ndarray,
    done_terminated: jnp.ndarray,
    done_abandoned: jnp.ndarray,
    discount_factor: float,
    target_action_log_probs: Optional[jnp.ndarray] = None,
    behaviour_action_log_probs: Optional[jnp.ndarray] = None,
    lambda_: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized Advantage Estimator: V-trace with unit importance weights."""
    del target_action_log_probs, behaviour_action_log_probs
    zeros = jnp.zeros_like(rewards)
    return vtrace(
        values,
        rewards,
        done_terminated,
        done_abandoned,
        discount_factor,
        zeros,
        zeros,
        lambda_=lambda_,
        max_importance_weight=1.0,
    )


def n_step(
    values: jnp.ndarray,
    rewards: jnp.ndarray,
    done_terminated: jnp.ndarray,
    done_abandoned: jnp.ndarray,
    discount_factor: float,
    n: int,
    target_action_log_probs: Optional[jnp.ndarray] = None,
    behaviour_action_log_probs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """N-step return targets with abandoned-aware padding.

    The last n-1 steps fall back to shorter returns via padding with
    abandon=True (which substitutes the current value), matching the
    reference's window construction.
    """
    values = jnp.asarray(values, jnp.float32)
    rewards = jnp.asarray(rewards, jnp.float32)
    unroll_length, batch = rewards.shape
    eff_n = min(n, unroll_length)

    pad = eff_n - 1
    nvalues = jnp.concatenate(
        [values, jnp.zeros((pad, batch), jnp.float32)], axis=0
    )
    ndone_terminated = jnp.concatenate(
        [done_terminated, jnp.zeros((pad, batch), bool)], axis=0
    )
    ndone_abandoned = jnp.concatenate(
        [done_abandoned, jnp.ones((pad, batch), bool)], axis=0
    )
    nrewards = jnp.concatenate(
        [rewards, jnp.zeros((pad, batch), jnp.float32)], axis=0
    )

    future_value = nvalues[eff_n:]
    window = unroll_length

    # eff_n is static and small — a Python loop unrolls into eff_n fused
    # elementwise ops, which XLA handles better than a scan of this shape.
    for i in range(eff_n):
        start = eff_n - i - 1
        rel_values = jax.lax.dynamic_slice_in_dim(nvalues, start, window)
        rel_rewards = jax.lax.dynamic_slice_in_dim(nrewards, start, window)
        rel_term = jax.lax.dynamic_slice_in_dim(
            ndone_terminated, start, window
        )
        rel_aband = jax.lax.dynamic_slice_in_dim(ndone_abandoned, start, window)

        not_terminated = (~rel_term).astype(jnp.float32)
        not_abandoned = (~rel_aband).astype(jnp.float32)
        one_step = rel_rewards + discount_factor * not_terminated * future_value
        future_value = (
            not_abandoned * one_step + (1.0 - not_abandoned) * rel_values
        )

    targets = future_value
    advantages = targets - values[:-1]
    return (
        jax.lax.stop_gradient(targets),
        jax.lax.stop_gradient(advantages),
    )


class GAE:
    """Estimator object matching the reference's gin-configurable GAE."""

    def __init__(self, lambda_: float):
        self.lambda_ = lambda_

    def __call__(self, values, rewards, done_terminated, done_abandoned,
                 discount_factor, target_action_log_probs,
                 behaviour_action_log_probs):
        return gae(values, rewards, done_terminated, done_abandoned,
                   discount_factor, lambda_=self.lambda_)


class VTrace:
    def __init__(self, lambda_: float, max_importance_weight: float = 1.0):
        self.lambda_ = lambda_
        self.max_importance_weight = max_importance_weight

    def __call__(self, values, rewards, done_terminated, done_abandoned,
                 discount_factor, target_action_log_probs,
                 behaviour_action_log_probs):
        return vtrace(values, rewards, done_terminated, done_abandoned,
                      discount_factor, target_action_log_probs,
                      behaviour_action_log_probs, lambda_=self.lambda_,
                      max_importance_weight=self.max_importance_weight)


class NStep:
    def __init__(self, n: int):
        self.n = n

    def __call__(self, values, rewards, done_terminated, done_abandoned,
                 discount_factor, target_action_log_probs,
                 behaviour_action_log_probs):
        return n_step(values, rewards, done_terminated, done_abandoned,
                      discount_factor, self.n)
