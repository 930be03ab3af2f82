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
