"""Ground-truth tests for the abandoned-aware advantage estimators.

Mirrors /root/reference/agents/policy_gradient/modules/advantages_test.py:
naive per-state numpy recursions, termination/abandonment edge cases, and the
GAE==V-trace(rho=1) identity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from seed_rl_tpu.ops import advantages


def _naive_vtrace(values, rewards, done_term, done_aband, gamma, t_logp,
                  b_logp, lambda_=1.0, max_iw=1.0):
    T, B = rewards.shape
    rhos = np.minimum(np.exp(t_logp - b_logp), max_iw)
    not_term = (~done_term).astype(np.float64)
    not_aband = (~done_aband).astype(np.float64)
    deltas = (rewards + gamma * not_term * values[1:] - values[:-1]) * not_aband
    propagate = not_term * not_aband

    acc = np.zeros(B)
    targets = np.zeros((T, B))
    advs = np.zeros((T, B))
    for i in range(T - 1, -1, -1):
        future = propagate[i] * gamma * lambda_ * acc
        advs[i] = deltas[i] + future
        acc = rhos[i] * (deltas[i] + future)
        targets[i] = values[i] + acc
    return targets, advs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vtrace_matches_naive(seed):
    rng = np.random.RandomState(seed)
    T, B = 7, 5
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done_term = rng.binomial(1, 0.2, (T, B)).astype(bool)
    done_aband = rng.binomial(1, 0.1, (T, B)).astype(bool) & ~done_term
    t_logp = rng.uniform(-1, 1, (T, B)).astype(np.float32)
    b_logp = rng.uniform(-1, 1, (T, B)).astype(np.float32)

    got_t, got_a = advantages.vtrace(
        values, rewards, done_term, done_aband, 0.95, t_logp, b_logp,
        lambda_=0.9, max_importance_weight=1.5,
    )
    want_t, want_a = _naive_vtrace(
        values, rewards, done_term, done_aband, 0.95, t_logp, b_logp,
        lambda_=0.9, max_iw=1.5,
    )
    # float32 kernel vs float64 naive recursion: allow accumulation rounding.
    np.testing.assert_allclose(got_t, want_t, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-3, atol=1e-3)


def test_abandoned_step_has_zero_advantage_and_value_target():
    T, B = 4, 1
    values = np.arange((T + 1) * B, dtype=np.float32).reshape(T + 1, B) + 1.0
    rewards = np.ones((T, B), np.float32)
    done_aband = np.zeros((T, B), bool)
    done_aband[2] = True
    done_term = np.zeros((T, B), bool)

    targets, advs = advantages.gae(
        values, rewards, done_term, done_aband, 0.9, lambda_=1.0
    )
    assert advs[2, 0] == 0.0
    assert targets[2, 0] == values[2, 0]


def test_terminated_step_bootstraps_zero():
    T, B = 1, 1
    values = np.array([[5.0], [100.0]], np.float32)
    rewards = np.array([[2.0]], np.float32)
    done_term = np.array([[True]])
    done_aband = np.array([[False]])

    targets, advs = advantages.gae(
        values, rewards, done_term, done_aband, 0.9
    )
    # Next-state value (100, post-reset) must be ignored.
    np.testing.assert_allclose(targets[0, 0], 2.0)
    np.testing.assert_allclose(advs[0, 0], 2.0 - 5.0)


def test_gae_equals_vtrace_with_unit_rhos():
    rng = np.random.RandomState(0)
    T, B = 6, 3
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done_term = rng.binomial(1, 0.2, (T, B)).astype(bool)
    done_aband = np.zeros((T, B), bool)

    t1, a1 = advantages.gae(
        values, rewards, done_term, done_aband, 0.97, lambda_=0.95
    )
    t2, a2 = advantages.vtrace(
        values, rewards, done_term, done_aband, 0.97,
        np.zeros((T, B), np.float32), np.zeros((T, B), np.float32),
        lambda_=0.95,
    )
    np.testing.assert_allclose(t1, t2, rtol=1e-5)
    np.testing.assert_allclose(a1, a2, rtol=1e-5)


def test_gae_matches_classic_formula_no_dones():
    # Without dones, GAE advantage = sum_l (gamma*lambda)^l delta_{t+l}.
    rng = np.random.RandomState(1)
    T, B = 5, 2
    gamma, lam = 0.99, 0.95
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    dones = np.zeros((T, B), bool)

    _, advs = advantages.gae(values, rewards, dones, dones, gamma, lambda_=lam)

    deltas = rewards + gamma * values[1:] - values[:-1]
    expected = np.zeros((T, B))
    for t in range(T):
        for l in range(T - t):
            expected[t] += (gamma * lam) ** l * deltas[t + l]
    np.testing.assert_allclose(advs, expected, rtol=1e-4, atol=1e-4)


def test_n_step_one_step_is_td_target():
    rng = np.random.RandomState(2)
    T, B = 4, 3
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done_term = np.zeros((T, B), bool)
    done_aband = np.zeros((T, B), bool)

    targets, advs = advantages.n_step(
        values, rewards, done_term, done_aband, 0.9, n=1
    )
    expected = rewards + 0.9 * values[1:]
    np.testing.assert_allclose(targets, expected, rtol=1e-5)
    np.testing.assert_allclose(advs, expected - values[:-1], rtol=1e-5)


def test_n_step_full_horizon_no_dones():
    # n >= T: target for step 0 is the full discounted return to values[T].
    T, B = 3, 1
    gamma = 0.5
    values = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
    rewards = np.array([[1.0], [1.0], [1.0]], np.float32)
    dones = np.zeros((T, B), bool)

    targets, _ = advantages.n_step(
        values, rewards, dones, dones, gamma, n=10
    )
    # step 0: 1 + .5*(1 + .5*(1 + .5*4)) = 1 + .5 + .25 + .5^3*4
    np.testing.assert_allclose(targets[0, 0], 1 + 0.5 + 0.25 + 0.5**3 * 4)
    # step 2 (last): padding forces fallback to 1-step: 1 + .5*4
    np.testing.assert_allclose(targets[2, 0], 1 + 0.5 * 4)


def test_n_step_termination_stops_bootstrap():
    T, B = 3, 1
    gamma = 0.9
    values = np.full((T + 1, B), 50.0, np.float32)
    rewards = np.ones((T, B), np.float32)
    done_term = np.array([[False], [True], [False]])
    done_aband = np.zeros((T, B), bool)

    targets, _ = advantages.n_step(
        values, rewards, done_term, done_aband, gamma, n=3
    )
    # Step 0: r0 + g*(r1 + 0) — termination at step 1 zeroes bootstrap.
    np.testing.assert_allclose(targets[0, 0], 1 + 0.9 * 1.0)


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
