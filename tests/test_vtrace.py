"""V-trace ground-truth tests vs. an independent numpy implementation.

Mirrors the reference's test strategy (/root/reference/tests/vtrace_test.py:
41-149): compare the scan-based kernel against a straightforward numpy
recursion on random inputs, plus the analytic lambda/clip edge cases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu.ops import vtrace


def _ground_truth_vtrace(
    log_rhos,
    discounts,
    rewards,
    values,
    bootstrap_value,
    clip_rho_threshold=1.0,
    clip_pg_rho_threshold=1.0,
    lambda_=1.0,
):
    """Naive numpy V-trace, written independently of the kernel."""
    T, B = rewards.shape
    rhos = np.exp(log_rhos)
    clipped_rhos = np.minimum(rhos, clip_rho_threshold) if clip_rho_threshold else rhos
    cs = lambda_ * np.minimum(rhos, 1.0)
    values_p1 = np.concatenate([values[1:], bootstrap_value[None]], 0)

    vs = np.zeros((T, B))
    for s in range(T):
        v_s = values[s].copy()
        for t in range(s, T):
            prod_c = np.prod(cs[s:t], axis=0) if t > s else np.ones(B)
            discount_prod = np.prod(discounts[s:t], axis=0) if t > s else np.ones(B)
            delta = clipped_rhos[t] * (
                rewards[t] + discounts[t] * values_p1[t] - values[t]
            )
            v_s += discount_prod * prod_c * delta
        vs[s] = v_s

    vs_p1 = np.concatenate([vs[1:], bootstrap_value[None]], 0)
    clipped_pg = (
        np.minimum(rhos, clip_pg_rho_threshold) if clip_pg_rho_threshold else rhos
    )
    pg_adv = clipped_pg * (rewards + discounts * vs_p1 - values)
    return vs, pg_adv


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("lambda_", [1.0, 0.9])
def test_vtrace_matches_numpy(seed, lambda_):
    rng = np.random.RandomState(seed)
    T, B = 5, 4
    log_rhos = rng.uniform(-2, 2, (T, B)).astype(np.float32)
    discounts = (
        rng.binomial(1, 0.9, (T, B)).astype(np.float32) * 0.95
    )
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)

    got = vtrace.from_importance_weights(
        target_action_log_probs=log_rhos,
        behaviour_action_log_probs=np.zeros_like(log_rhos),
        discounts=discounts,
        rewards=rewards,
        values=values,
        bootstrap_value=bootstrap,
        lambda_=lambda_,
    )
    want_vs, want_pg = _ground_truth_vtrace(
        log_rhos, discounts, rewards, values, bootstrap, lambda_=lambda_
    )
    np.testing.assert_allclose(got.vs, want_vs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got.pg_advantages, want_pg, rtol=1e-4, atol=1e-4)


def test_vtrace_no_clipping():
    rng = np.random.RandomState(7)
    T, B = 6, 3
    log_rhos = rng.uniform(-1, 1, (T, B)).astype(np.float32)
    discounts = np.full((T, B), 0.9, np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)

    got = vtrace.from_importance_weights(
        log_rhos,
        np.zeros_like(log_rhos),
        discounts,
        rewards,
        values,
        bootstrap,
        clip_rho_threshold=None,
        clip_pg_rho_threshold=None,
    )
    want_vs, want_pg = _ground_truth_vtrace(
        log_rhos, discounts, rewards, values, bootstrap,
        clip_rho_threshold=None, clip_pg_rho_threshold=None,
    )
    np.testing.assert_allclose(got.vs, want_vs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got.pg_advantages, want_pg, rtol=1e-4, atol=1e-4)


def test_vtrace_on_policy_equals_lambda_returns():
    # With rho == 1 and lambda == 1, vs are the on-policy lambda returns.
    T, B = 4, 2
    rng = np.random.RandomState(3)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)
    discounts = np.full((T, B), 0.9, np.float32)

    got = vtrace.from_importance_weights(
        np.zeros((T, B), np.float32),
        np.zeros((T, B), np.float32),
        discounts,
        rewards,
        values,
        bootstrap,
    )
    # Monte-carlo discounted return (lambda=1, on-policy).
    expected = np.zeros((T, B), np.float32)
    acc = bootstrap.copy()
    for t in reversed(range(T)):
        acc = rewards[t] + discounts[t] * acc
        expected[t] = acc
    np.testing.assert_allclose(got.vs, expected, rtol=1e-4, atol=1e-4)


def test_vtrace_gradients_stopped():
    T, B = 3, 2
    values = jnp.ones((T, B))

    def f(v):
        out = vtrace.from_importance_weights(
            jnp.zeros((T, B)),
            jnp.zeros((T, B)),
            jnp.full((T, B), 0.9),
            jnp.ones((T, B)),
            v,
            jnp.ones((B,)),
        )
        return jnp.sum(out.vs) + jnp.sum(out.pg_advantages)

    grads = jax.grad(f)(values)
    np.testing.assert_allclose(grads, np.zeros((T, B)))


def test_vtrace_jit_compiles():
    T, B = 8, 16
    f = jax.jit(
        lambda *a: vtrace.from_importance_weights(*a)
    )
    out = f(
        jnp.zeros((T, B)),
        jnp.zeros((T, B)),
        jnp.full((T, B), 0.99),
        jnp.ones((T, B)),
        jnp.zeros((T, B)),
        jnp.zeros((B,)),
    )
    assert out.vs.shape == (T, B)


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
