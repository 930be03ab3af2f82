"""R2D2 value-op tests: rescaling invertibility + hand-computed n-step targets.

Mirrors /root/reference/agents/r2d2/learner_test.py (:114-141 invertibility,
:142-202 hand-computed targets).
"""

import numpy as np
import jax.numpy as jnp

from seed_rl_tpu.ops import value_ops


def test_rescaling_invertible():
    x = np.linspace(-500.0, 500.0, 2001).astype(np.float32)
    y = value_ops.inverse_value_function_rescaling(
        value_ops.value_function_rescaling(x)
    )
    np.testing.assert_allclose(y, x, rtol=2e-3, atol=2e-3)


def test_rescaling_zero_fixed_point():
    assert float(value_ops.value_function_rescaling(jnp.array(0.0))) == 0.0
    assert (
        float(value_ops.inverse_value_function_rescaling(jnp.array(0.0)))
        == 0.0
    )


def _naive_n_step_target(rewards, done, q_target, gamma, n_steps):
    """Independent reimplementation: direct summation per (t, b)."""
    T, B = rewards.shape
    out = np.zeros((T, B), np.float64)
    for b in range(B):
        for t in range(T):
            n = min(n_steps, T - t)  # last steps fall back to shorter returns
            acc = 0.0
            notdone = 1.0
            for i in range(n):
                acc += gamma**i * notdone * rewards[t + i, b]
                notdone *= 1.0 - float(done[t + i, b])
            # bootstrap with q_target at t+n-1 (the last available one).
            acc += gamma**n * notdone * q_target[min(t + n - 1, T - 1), b]
            out[t, b] = acc
    return out


def test_n_step_bellman_target_one_step():
    rng = np.random.RandomState(0)
    T, B = 6, 4
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.binomial(1, 0.3, (T, B)).astype(bool)
    q_target = rng.normal(size=(T, B)).astype(np.float32)
    gamma = 0.9

    got = value_ops.n_step_bellman_target(rewards, done, q_target, gamma, 1)
    want = rewards + gamma * (1.0 - done.astype(np.float32)) * q_target
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_n_step_bellman_target_matches_naive():
    rng = np.random.RandomState(1)
    T, B = 8, 3
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.binomial(1, 0.2, (T, B)).astype(bool)
    q_target = rng.normal(size=(T, B)).astype(np.float32)
    gamma = 0.95

    for n_steps in [1, 2, 3, 5]:
        got = np.asarray(
            value_ops.n_step_bellman_target(
                rewards, done, q_target, gamma, n_steps
            )
        )
        want = _naive_n_step_target(rewards, done, q_target, gamma, n_steps)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4, err_msg=f"n_steps={n_steps}"
        )


def test_n_step_bellman_target_hand_computed():
    # T=3, B=1, gamma=0.5, n=2, no dones.
    rewards = np.array([[1.0], [2.0], [3.0]], np.float32)
    done = np.zeros((3, 1), bool)
    q = np.array([[10.0], [20.0], [30.0]], np.float32)
    got = np.asarray(
        value_ops.n_step_bellman_target(rewards, done, q, 0.5, 2)
    )
    # t=0: r0 + g*r1 + g^2*q1 = 1 + 1 + 5 = 7
    # t=1: r1 + g*r2 + g^2*q2 = 2 + 1.5 + 7.5 = 11
    # t=2: r2 + g*q2 = 3 + 15 = 18  (fallback to 1-step)
    np.testing.assert_allclose(got[:, 0], [7.0, 11.0, 18.0], rtol=1e-5)


def test_td_loss_and_priorities_shapes_and_priority_formula():
    rng = np.random.RandomState(2)
    T, B, A = 5, 4, 3
    q = rng.normal(size=(T, B, A)).astype(np.float32)
    tq = rng.normal(size=(T, B, A)).astype(np.float32)
    amax = rng.randint(0, A, (T, B)).astype(np.int32)
    act = rng.randint(0, A, (T, B)).astype(np.int32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.binomial(1, 0.2, (T, B)).astype(bool)

    loss, prio = value_ops.td_loss_and_priorities(
        q, tq, amax, act, rewards, done, gamma=0.99, n_steps=2, eta=0.9
    )
    assert loss.shape == (B,)
    assert prio.shape == (B,)
    assert np.all(np.asarray(prio) >= 0)
    assert np.all(np.isfinite(np.asarray(loss)))

    # eta=1 -> priority is max |td|; eta=0 -> mean |td|.
    _, prio_max = value_ops.td_loss_and_priorities(
        q, tq, amax, act, rewards, done, gamma=0.99, n_steps=2, eta=1.0
    )
    _, prio_mean = value_ops.td_loss_and_priorities(
        q, tq, amax, act, rewards, done, gamma=0.99, n_steps=2, eta=0.0
    )
    assert np.all(np.asarray(prio_max) >= np.asarray(prio_mean) - 1e-6)


def _naive_retrace_target(rewards, done, q_max, q_rep, trace, gamma):
    """Independent reimplementation: explicit backward loop per (t, b)."""
    T, B = rewards.shape
    out = np.zeros((T, B), np.float64)
    for b in range(B):
        g_next = q_rep[T - 1, b]
        for t in range(T - 1, -1, -1):
            nd = 1.0 - float(done[t, b])
            g = rewards[t, b] + gamma * nd * (
                q_max[t, b] + trace[t, b] * (g_next - q_rep[t, b])
            )
            out[t, b] = g
            g_next = g
    return out


def test_retrace_target_matches_naive():
    rng = np.random.default_rng(0)
    T, B = 9, 5
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.random((T, B)) < 0.2
    q_max = rng.normal(size=(T, B)).astype(np.float32)
    # q at the replayed action <= max by construction.
    q_rep = q_max - np.abs(rng.normal(size=(T, B))).astype(np.float32)
    trace = (0.95 * (rng.random((T, B)) < 0.7)).astype(np.float32)
    got = value_ops.retrace_target(
        rewards, done, q_max, q_rep, trace, gamma=0.97
    )
    want = _naive_retrace_target(rewards, done, q_max, q_rep, trace, 0.97)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_retrace_reduces_to_full_n_step_when_on_policy():
    """With lambda=1 and every replayed action greedy (c == 1,
    q_rep == q_max), Retrace telescopes to the full-sequence n-step
    target — the reduction property named by the round-3 review."""
    rng = np.random.default_rng(1)
    T, B = 8, 4
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.random((T, B)) < 0.25
    q_max = rng.normal(size=(T, B)).astype(np.float32)
    trace = np.ones((T, B), np.float32)
    got = value_ops.retrace_target(
        rewards, done, q_max, q_max, trace, gamma=0.9
    )
    want = value_ops.n_step_bellman_target(
        rewards, done, q_max, gamma=0.9, n_steps=T
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_retrace_loss_matches_nstep_loss_when_on_policy():
    """retrace_loss_and_priorities == td_loss_and_priorities when the
    replayed actions are greedy, lambda=1, and n_steps spans the sequence
    (shared h-rescaling + priority formula)."""
    rng = np.random.default_rng(2)
    T, B, A = 7, 3, 5
    q = rng.normal(size=(T, B, A)).astype(np.float32)
    tq = rng.normal(size=(T, B, A)).astype(np.float32)
    greedy = np.argmax(tq, axis=-1).astype(np.int32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.random((T, B)) < 0.2
    loss_r, pri_r = value_ops.retrace_loss_and_priorities(
        q, tq, greedy, greedy, rewards, done, gamma=0.95, lambda_=1.0
    )
    loss_n, pri_n = value_ops.td_loss_and_priorities(
        q, tq, greedy, greedy, rewards, done, gamma=0.95, n_steps=T
    )
    np.testing.assert_allclose(
        np.asarray(loss_r), np.asarray(loss_n), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pri_r), np.asarray(pri_n), rtol=1e-4, atol=1e-4
    )


def test_retrace_cuts_trace_at_exploratory_actions():
    """A non-greedy action at step k makes targets before k independent of
    rewards after k (the trace is cut: c_k = 0)."""
    T, B = 6, 1
    rewards = np.zeros((T, B), np.float32)
    done = np.zeros((T, B), bool)
    q_max = np.ones((T, B), np.float32)
    q_rep = np.ones((T, B), np.float32)
    trace = np.ones((T, B), np.float32)
    trace[3, 0] = 0.0  # exploratory action at t=3
    base = np.asarray(value_ops.retrace_target(
        rewards, done, q_max, q_rep, trace, gamma=0.9
    ))
    rewards2 = rewards.copy()
    rewards2[5, 0] = 100.0  # reward change after the cut
    changed = np.asarray(value_ops.retrace_target(
        rewards2, done, q_max, q_rep, trace, gamma=0.9
    ))
    np.testing.assert_allclose(changed[:3], base[:3], atol=1e-6)
    assert abs(changed[5, 0] - base[5, 0]) > 1.0  # after the cut: differs


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
