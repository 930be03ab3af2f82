"""Pallas V-trace kernel vs. the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from seed_rl_tpu.ops import vtrace as vtrace_ref
from seed_rl_tpu.ops.pallas import vtrace_kernel


def test_pallas_vtrace_matches_scan():
    rng = np.random.RandomState(0)
    T, B = 12, 256
    target_logp = rng.uniform(-1, 1, (T, B)).astype(np.float32)
    behaviour_logp = rng.uniform(-1, 1, (T, B)).astype(np.float32)
    discounts = (rng.binomial(1, 0.9, (T, B)) * 0.99).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)

    want = vtrace_ref.from_importance_weights(
        target_logp, behaviour_logp, discounts, rewards, values, bootstrap,
        lambda_=0.95,
    )
    got = vtrace_kernel.from_importance_weights_pallas(
        target_logp, behaviour_logp, discounts, rewards, values, bootstrap,
        lambda_=0.95, interpret=True,
    )
    np.testing.assert_allclose(got.vs, want.vs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        got.pg_advantages, want.pg_advantages, rtol=1e-5, atol=1e-5
    )


def test_pallas_vtrace_no_clipping():
    rng = np.random.RandomState(1)
    T, B = 5, 128
    args = dict(
        target_action_log_probs=rng.uniform(-1, 1, (T, B)).astype(np.float32),
        behaviour_action_log_probs=np.zeros((T, B), np.float32),
        discounts=np.full((T, B), 0.9, np.float32),
        rewards=rng.normal(size=(T, B)).astype(np.float32),
        values=rng.normal(size=(T, B)).astype(np.float32),
        bootstrap_value=rng.normal(size=(B,)).astype(np.float32),
        clip_rho_threshold=None,
        clip_pg_rho_threshold=None,
    )
    want = vtrace_ref.from_importance_weights(**args)
    got = vtrace_kernel.from_importance_weights_pallas(
        **args, interpret=True
    )
    np.testing.assert_allclose(got.vs, want.vs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        got.pg_advantages, want.pg_advantages, rtol=1e-5, atol=1e-5
    )


def test_dispatch_falls_back_on_cpu():
    T, B = 3, 8
    out = vtrace_kernel.from_importance_weights(
        jnp.zeros((T, B)), jnp.zeros((T, B)), jnp.full((T, B), 0.9),
        jnp.ones((T, B)), jnp.zeros((T, B)), jnp.zeros((B,)),
    )
    assert out.vs.shape == (T, B)
