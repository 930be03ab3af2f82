"""Tests for parametric action distributions (pure-JAX, no TFP).

Checks analytic identities (softmax entropy/KL, normal log-densities),
boundary-corrected tanh log_prob finiteness/differentiability, the std
transforms' zero-param contract, sampling statistics, and the gymnasium
action-space dispatch (reference parity:
/root/reference/common/parametric_distribution.py).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu import distributions as pd


def test_categorical_log_prob_entropy_kl():
    logits = jnp.array([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
    dist = pd.CategoricalDistribution(3)
    actions = jnp.array([1, 2], jnp.int32)

    probs = np.exp(np.asarray(jax.nn.log_softmax(logits)))
    lp = np.asarray(dist.log_prob(logits, actions))
    np.testing.assert_allclose(lp, np.log(probs[[0, 1], [1, 2]]), rtol=1e-5)

    ent = np.asarray(dist.entropy(logits))
    want_ent = -(probs * np.log(probs)).sum(-1)
    np.testing.assert_allclose(ent, want_ent, rtol=1e-5)

    np.testing.assert_allclose(
        np.asarray(dist.kl_divergence(logits, logits)), 0.0, atol=1e-6
    )
    # Uniform row: entropy log(3).
    np.testing.assert_allclose(ent[1], math.log(3.0), rtol=1e-5)


def test_categorical_sampling_distribution():
    dist = pd.CategoricalDistribution(4)
    logits = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    samples = jax.vmap(lambda k: dist.sample(logits, k))(keys)
    freqs = np.bincount(np.asarray(samples), minlength=4) / 20000
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_multi_categorical_factorizes():
    n_dims, n_act = 3, 4
    dist = pd.MultiCategoricalDistribution(n_dims, n_act)
    single = pd.CategoricalDistribution(n_act)
    rng = np.random.RandomState(0)
    params = jnp.asarray(rng.normal(size=(2, n_dims * n_act)), jnp.float32)
    actions = jnp.asarray(rng.randint(0, n_act, (2, n_dims)), jnp.int32)

    lp = dist.log_prob(params, actions)
    logits = params.reshape(2, n_dims, n_act)
    want = sum(
        np.asarray(single.log_prob(logits[:, d], actions[:, d]))
        for d in range(n_dims)
    )
    np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-5)

    ent = dist.entropy(params)
    want_ent = sum(
        np.asarray(single.entropy(logits[:, d])) for d in range(n_dims)
    )
    np.testing.assert_allclose(np.asarray(ent), want_ent, rtol=1e-5)


def test_normal_tanh_log_prob_matches_change_of_variables():
    dist = pd.NormalTanhDistribution(2)
    params = jnp.array([0.3, -0.2, 0.1, 0.4])  # loc, then raw scale
    loc = np.array([0.3, -0.2])
    scale = np.log1p(np.exp([0.1, 0.4])) + 1e-3

    action = jnp.array([0.5, -0.7])
    x = np.arctanh(np.asarray(action))
    want = (
        -0.5 * ((x - loc) / scale) ** 2
        - np.log(scale)
        - 0.5 * math.log(2 * math.pi)
        - np.log1p(-np.tanh(x) ** 2)
    ).sum()
    got = float(dist.log_prob(params, action))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_normal_tanh_log_prob_finite_and_differentiable_at_boundary():
    dist = pd.NormalTanhDistribution(1)
    params = jnp.array([0.0, 0.0])
    for a in [-1.0, -0.9999, 0.9999, 1.0]:
        lp = float(dist.log_prob(params, jnp.array([a])))
        assert np.isfinite(lp), a
        g = jax.grad(lambda p: dist.log_prob(p, jnp.array([a])))(params)
        assert np.all(np.isfinite(np.asarray(g))), a


def test_normal_tanh_boundary_is_tail_average_density():
    # At the boundary the log_prob must be log(P(tail)/epsilon).
    threshold = 0.999
    dist = pd.NormalTanhDistribution(1, threshold=threshold)
    params = jnp.array([0.5, 0.2])
    scale = float(jax.nn.softplus(0.2) + 1e-3)
    t = np.arctanh(threshold)
    from scipy.stats import norm as spnorm

    want_right = spnorm.logsf(t, 0.5, scale) - math.log(1 - threshold)
    got_right = float(dist.log_prob(params, jnp.array([1.0])))
    np.testing.assert_allclose(got_right, want_right, rtol=1e-4)

    want_left = spnorm.logcdf(-t, 0.5, scale) - math.log(1 - threshold)
    got_left = float(dist.log_prob(params, jnp.array([-1.0])))
    np.testing.assert_allclose(got_left, want_left, rtol=1e-4)


def test_normal_tanh_sample_within_bounds_and_reparametrized():
    dist = pd.NormalTanhDistribution(3)
    assert dist.reparametrizable
    params = jnp.arange(6.0)
    s = dist.sample(params, jax.random.PRNGKey(1))
    assert np.all(np.abs(np.asarray(s)) <= 1.0)
    # Grad of sample w.r.t. params must be nonzero (pathwise).
    g = jax.grad(lambda p: jnp.sum(dist.sample(p, jax.random.PRNGKey(1))))(
        params
    )
    assert np.any(np.asarray(g) != 0)


def test_normal_kl_identity():
    dist = pd.NormalClippedDistribution(2)
    pa = jnp.array([0.0, 0.0, 0.5, 0.5])
    np.testing.assert_allclose(
        float(dist.kl_divergence(pa, pa)), 0.0, atol=1e-6
    )
    # KL(N(0,1)||N(1,1)) = 0.5 per dim.
    inv_softplus_1 = math.log(math.expm1(1.0 - 1e-3))
    p0 = jnp.array([0.0, 0.0, inv_softplus_1, inv_softplus_1])
    p1 = jnp.array([1.0, 1.0, inv_softplus_1, inv_softplus_1])
    np.testing.assert_allclose(
        float(dist.kl_divergence(p0, p1)), 1.0, rtol=1e-3
    )


def test_std_fns_zero_param_contract():
    for maker in [pd.safe_exp_std_fn, pd.softplus_std_fn]:
        fn = maker(1.0, 1e-3)
        np.testing.assert_allclose(float(fn(jnp.array(0.0))), 1.0, atol=1e-3)
        fn2 = maker(0.5, 1e-2)
        np.testing.assert_allclose(float(fn2(jnp.array(0.0))), 0.5, atol=1e-3)


def test_safe_exp_gradient_outside_clip():
    g = jax.grad(pd.safe_exp)(jnp.array(20.0))
    # Forward is clipped at exp(15); the gradient matches the clipped forward.
    np.testing.assert_allclose(float(g), math.exp(15.0), rtol=1e-5)
    assert np.isfinite(float(g))


def test_joint_distribution_mixed_spaces():
    cat = pd.CategoricalDistribution(3)
    cont = pd.NormalTanhDistribution(2)
    joint = pd.JointDistribution([cat, cont])
    assert joint.param_size == 3 + 4

    params = jnp.asarray(
        np.random.RandomState(0).normal(size=(joint.param_size,)), jnp.float32
    )
    s = joint.sample(params, jax.random.PRNGKey(0))
    assert s.shape == (3,)  # 1 discrete slot + 2 continuous dims

    lp = joint.log_prob(params, s)
    want = cat.log_prob(params[:3], s[0].astype(jnp.int32)) + cont.log_prob(
        params[3:], s[1:]
    )
    np.testing.assert_allclose(float(lp), float(want), rtol=1e-5)


def test_action_space_dispatch():
    import gymnasium as gym

    assert isinstance(
        pd.get_parametric_distribution_for_action_space(gym.spaces.Discrete(5)),
        pd.CategoricalDistribution,
    )
    assert isinstance(
        pd.get_parametric_distribution_for_action_space(
            gym.spaces.MultiDiscrete([3, 3])
        ),
        pd.MultiCategoricalDistribution,
    )
    box = gym.spaces.Box(low=-1.0, high=1.0, shape=(4,))
    assert isinstance(
        pd.get_parametric_distribution_for_action_space(box),
        pd.NormalTanhDistribution,
    )
    with pytest.raises(ValueError):
        pd.get_parametric_distribution_for_action_space(
            gym.spaces.Box(low=0.0, high=1.0, shape=(4,))
        )
    tup = gym.spaces.Tuple([gym.spaces.Discrete(2), box])
    assert isinstance(
        pd.get_parametric_distribution_for_action_space(tup),
        pd.JointDistribution,
    )


def test_deterministic_tanh():
    dist = pd.DeterministicTanhDistribution(2)
    params = jnp.array([0.5, -2.0])
    s = dist.sample(params, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), np.tanh([0.5, -2.0]), rtol=1e-4)


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
