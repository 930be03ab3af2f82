"""R2D2 value-function ops: rescaling, n-step Bellman targets, priorities.

Semantics match /root/reference/agents/r2d2/learner.py:
- ``value_function_rescaling`` / inverse (lines 180-192; R2D2 paper table 2 and
  Proposition A.2 of "Observe and Look Further").
- ``n_step_bellman_target`` (lines 195-255) including the end-of-sequence
  handling: the last n-1 targets fall back to shorter returns reusing the
  final Q_target.
- ``td_loss_and_priorities`` mirrors
  ``compute_loss_and_priorities_from_agent_outputs`` (lines 258-330): double
  DQN over sequences, priority = eta*max|TD| + (1-eta)*mean|TD|.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def value_function_rescaling(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """h(x) = sign(x)*(sqrt(|x|+1)-1) + eps*x."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def inverse_value_function_rescaling(
    x: jnp.ndarray, eps: float = 1e-3
) -> jnp.ndarray:
    """h^{-1}(x); exact inverse of ``value_function_rescaling``."""
    return jnp.sign(x) * (
        jnp.square(
            (jnp.sqrt(1.0 + 4.0 * eps * (jnp.abs(x) + 1.0 + eps)) - 1.0)
            / (2.0 * eps)
        )
        - 1.0
    )


def n_step_bellman_target(
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    q_target: jnp.ndarray,
    gamma: float,
    n_steps: int,
) -> jnp.ndarray:
    """Computes n-step Bellman targets over a [T, B] sequence.

    For n_steps=1: ``r_t + gamma * (1-done_t) * Q_target(s_{t+1}, a*)``. In
    general a sum of up-to-n discounted rewards plus the bootstrapped
    Q_target, with the product-of-not-done masking; the last n-1 targets use
    shorter returns reusing the final q_target (divided by gamma^k so the
    discounting in the recursion cancels).

    Args:
      rewards: f32[T, B].
      done: bool[T, B]; true if the episode ended just after reward r_t.
      q_target: f32[T, B] = Q_target(s_{t+1}, a*).
      gamma: discount.
      n_steps: lookahead.

    Returns:
      f32[T, B] targets.
    """
    rewards = jnp.asarray(rewards, jnp.float32)
    q_target = jnp.asarray(q_target, jnp.float32)

    bellman_target = jnp.concatenate(
        [jnp.zeros_like(q_target[0:1]), q_target]
        + [q_target[-1:] / gamma**k for k in range(1, n_steps)],
        axis=0,
    )
    done_f = jnp.concatenate(
        [done.astype(jnp.float32)]
        + [jnp.zeros_like(rewards[0:1])] * n_steps,
        axis=0,
    )
    rewards = jnp.concatenate(
        [rewards] + [jnp.zeros_like(rewards[0:1])] * n_steps, axis=0
    )

    # n_steps is small and static — unrolled elementwise updates fuse well.
    for _ in range(n_steps):
        rewards = rewards[:-1]
        done_f = done_f[:-1]
        bellman_target = (
            rewards + gamma * (1.0 - done_f) * bellman_target[1:]
        )
    return bellman_target


def retrace_target(
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    q_target_max: jnp.ndarray,
    q_target_replay: jnp.ndarray,
    trace_coefficients: jnp.ndarray,
    gamma: float,
) -> jnp.ndarray:
    """Retrace(lambda) targets over a [T, B] sequence (unrescaled space).

    Munos et al. 2016 ("Safe and efficient off-policy RL") specialized to
    R2D2's greedy double-DQN target policy: with the c-bar=1 clip,
    c_t = lambda * min(1, pi(a_t)/mu(a_t)) = lambda * 1[a_t == argmax_a
    Q_online] for greedy pi (any behaviour mu), i.e. Watkins-style trace
    cutting — no stored behaviour probabilities needed. Backward
    recursion, same post-transition indexing as ``n_step_bellman_target``:

      G[t] = r[t] + gamma*(1-d[t]) * ( M[t] + c[t]*(G[t+1] - Q[t]) )

    where M[t] = max-bootstrap value at o_t, Q[t] = target-net value of the
    replayed action at o_t, and the recursion is seeded with G[T] := Q[T-1]
    (pure bootstrap at the sequence end). With c == 1 everywhere (lambda=1,
    all replayed actions greedy) this telescopes to the full-sequence
    n-step target — pinned by tests/test_value_ops.py.

    Args:
      rewards: f32[T, B].
      done: bool[T, B].
      q_target_max: f32[T, B] — h^{-1}(Q_target(o_t, argmax_a Q_online)).
      q_target_replay: f32[T, B] — h^{-1}(Q_target(o_t, a_t)).
      trace_coefficients: f32[T, B] — c_t in [0, lambda].
      gamma: discount.

    Returns:
      f32[T, B]: G[t] is the return estimate whose reward sum starts at
      r[t] — consumed shifted by one exactly like the n-step targets
      (target for Q(o_t, a_t) is G[t+1]).
    """
    rewards = jnp.asarray(rewards, jnp.float32)
    not_done = 1.0 - done.astype(jnp.float32)

    def backward(g_next, xs):
        r, nd, m, q_rep, c = xs
        g = r + gamma * nd * (m + c * (g_next - q_rep))
        return g, g

    # Boundary: the correction term vanishes at the end of the sequence
    # (G[T] = Q[T-1] makes the t = T-1 step a pure max-bootstrap).
    _, targets = jax.lax.scan(
        backward,
        q_target_replay[-1],
        (rewards, not_done, q_target_max, q_target_replay,
         jnp.asarray(trace_coefficients, jnp.float32)),
        reverse=True,
    )
    return targets


def retrace_loss_and_priorities(
    q_values: jnp.ndarray,
    target_q_values: jnp.ndarray,
    online_argmax_action: jnp.ndarray,
    replay_action: jnp.ndarray,
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    gamma: float,
    lambda_: float = 0.95,
    eta: float = 0.9,
    rescaling_eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence double-DQN loss with Retrace(lambda) targets (R2D2 shapes).

    Drop-in alternative to ``td_loss_and_priorities`` (same signature plus
    ``lambda_``): targets are the clipped-trace Retrace recursion on
    h-rescaled values instead of fixed n-step Bellman sums. Priorities use
    the identical eta*max+mean formula.
    """
    replay_q = jnp.take_along_axis(
        q_values, replay_action[..., None], axis=2
    ).squeeze(-1)
    q_target_max = inverse_value_function_rescaling(
        jnp.take_along_axis(
            target_q_values, online_argmax_action[..., None], axis=2
        ).squeeze(-1),
        rescaling_eps,
    )
    q_target_replay = inverse_value_function_rescaling(
        jnp.take_along_axis(
            target_q_values, replay_action[..., None], axis=2
        ).squeeze(-1),
        rescaling_eps,
    )
    trace = lambda_ * (replay_action == online_argmax_action).astype(
        jnp.float32
    )
    targets = jax.lax.stop_gradient(
        retrace_target(
            rewards, done, q_target_max, q_target_replay, trace, gamma
        )
    )
    targets = value_function_rescaling(targets[1:], rescaling_eps)
    replay_q = replay_q[:-1]

    abs_td_errors = jnp.abs(targets - replay_q)
    priorities = eta * jnp.max(abs_td_errors, axis=0) + (
        1.0 - eta
    ) * jnp.mean(abs_td_errors, axis=0)
    loss = 0.5 * jnp.sum(jnp.square(abs_td_errors), axis=0)
    return loss, jax.lax.stop_gradient(priorities)


def td_loss_and_priorities(
    q_values: jnp.ndarray,
    target_q_values: jnp.ndarray,
    online_argmax_action: jnp.ndarray,
    replay_action: jnp.ndarray,
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    gamma: float,
    n_steps: int,
    eta: float = 0.9,
    rescaling_eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence double-DQN loss + replay priorities (R2D2).

    Args:
      q_values: f32[T, B, A] online-network Q values (trained).
      target_q_values: f32[T, B, A] target-network Q values.
      online_argmax_action: i32[T, B] argmax_a Q_online(s, a) (double DQN).
      replay_action: i32[T, B] action actually played.
      rewards: f32[T, B].
      done: bool[T, B].
      gamma: discount.
      n_steps: Bellman lookahead.
      eta: max/mean mixing for priorities.
      rescaling_eps: epsilon of the value rescaling.

    Returns:
      (loss f32[B] — 0.5 * sum_t TD^2, priorities f32[B]).
    """
    replay_q = jnp.take_along_axis(
        q_values, replay_action[..., None], axis=2
    ).squeeze(-1)
    qtarget_max = inverse_value_function_rescaling(
        jnp.take_along_axis(
            target_q_values, online_argmax_action[..., None], axis=2
        ).squeeze(-1),
        rescaling_eps,
    )

    bellman_target = jax.lax.stop_gradient(
        n_step_bellman_target(rewards, done, qtarget_max, gamma, n_steps)
    )

    # replay_q[t] is Q(s_{t+1}, a_{t+1}) in env-step indexing (the unroll
    # stores post-transition observations), so shift targets by one.
    bellman_target = value_function_rescaling(
        bellman_target[1:], rescaling_eps
    )
    replay_q = replay_q[:-1]

    abs_td_errors = jnp.abs(bellman_target - replay_q)
    priorities = eta * jnp.max(abs_td_errors, axis=0) + (1.0 - eta) * jnp.mean(
        abs_td_errors, axis=0
    )
    loss = 0.5 * jnp.sum(jnp.square(abs_td_errors), axis=0)
    return loss, jax.lax.stop_gradient(priorities)
