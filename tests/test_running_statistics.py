"""Tests for running statistics, PopArt and input normalization.

Mirrors the reference's running_statistics_test.py / popart_test.py /
input_normalization_test.py: analytic mean/std expectations, invariance of
predictions under statistics updates, and two-level buffer equivalence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from seed_rl_tpu.ops import running_statistics as rs
from seed_rl_tpu.ops.popart import PopArt
from seed_rl_tpu.agents.ppo.input_normalization import InputNormalization


def test_average_mean_std_matches_numpy():
    tracker = rs.AverageMeanStd()
    state = tracker.init_state(3)
    rng = np.random.RandomState(0)
    chunks = [rng.normal(size=(5, 4, 3)).astype(np.float32) * (i + 1)
              for i in range(4)]
    for c in chunks:
        state = tracker.update(state, c)
    all_data = np.concatenate([c.reshape(-1, 3) for c in chunks], 0)
    mean, std = tracker.mean_std(state)
    np.testing.assert_allclose(np.asarray(mean), all_data.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std), all_data.std(0), rtol=1e-3)


def test_average_mean_std_initial_std_is_one():
    tracker = rs.AverageMeanStd()
    state = tracker.init_state(2)
    mean, std = tracker.mean_std(state)
    np.testing.assert_allclose(np.asarray(mean), 0.0)
    np.testing.assert_allclose(np.asarray(std), 1.0)


def test_ema_mean_std():
    tracker = rs.EMAMeanStd(beta=0.5)
    state = tracker.init_state(1)
    data = jnp.full((10, 1), 3.0)
    # first moment: 0 + 0.5*(3-0) = 1.5; second: 1 + 0.5*(9-1) = 5
    state = tracker.update(state, data)
    np.testing.assert_allclose(float(state.first_moment[0]), 1.5)
    np.testing.assert_allclose(float(state.second_moment[0]), 5.0)
    mean, std = tracker.mean_std(state)
    np.testing.assert_allclose(float(std[0]), np.sqrt(5 - 1.5**2), rtol=1e-5)


def test_fixed_mean_std():
    tracker = rs.FixedMeanStd(mean=2.0, std=4.0)
    state = tracker.init_state(3)
    x = jnp.array([10.0, 10.0, 10.0])
    np.testing.assert_allclose(
        np.asarray(tracker.normalize(state, x)), 2.0
    )
    np.testing.assert_allclose(
        np.asarray(tracker.unnormalize(state, tracker.normalize(state, x))),
        np.asarray(x),
    )


def test_two_level_matches_single_level():
    single = rs.AverageMeanStd()
    double = rs.TwoLevelAverageMeanStd(buffer_size=3)
    s1 = single.init_state(2)
    s2 = double.init_state(2)
    rng = np.random.RandomState(1)
    for _ in range(10):
        data = rng.normal(size=(6, 2)).astype(np.float32)
        s1 = single.update(s1, data)
        s2 = double.update(s2, data)
    m1, std1 = single.mean_std(s1)
    m2, std2 = double.mean_std(s2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std1), np.asarray(std2), rtol=1e-4)


def test_two_level_empty_returns_unit_std():
    double = rs.TwoLevelAverageMeanStd()
    state = double.init_state(2)
    mean, std = double.mean_std(state)
    np.testing.assert_allclose(np.asarray(mean), 0.0)
    np.testing.assert_allclose(np.asarray(std), 1.0)


def test_popart_compensation_invariance():
    """Statistics updates must not change s*(x*a+b)+m."""
    popart = PopArt(rs.AverageMeanStd(), compensate=True)
    state = popart.init_state()
    params = popart.init_params()

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(7,)), jnp.float32)

    def implicit_prediction(state, params, x):
        return popart.unnormalize_prediction(
            state, popart.correct_prediction(params, x)
        )

    before = implicit_prediction(state, params, x)
    data = jnp.asarray(rng.normal(size=(4, 5)) * 10 + 3, jnp.float32)
    state2, params2, _ = popart.update_statistics(state, params, data)
    after = implicit_prediction(state2, params2, x)
    np.testing.assert_allclose(
        np.asarray(before), np.asarray(after), rtol=1e-4, atol=1e-4
    )

    # And the normalization now reflects the data statistics.
    mean, std = popart.tracker.mean_std(state2)
    np.testing.assert_allclose(
        float(mean[0]), float(jnp.mean(data)), rtol=1e-4
    )


def test_popart_normalize_advantage_divides_by_std():
    popart = PopArt(rs.FixedMeanStd(mean=5.0, std=2.0))
    state = popart.init_state()
    adv = jnp.array([4.0])
    np.testing.assert_allclose(
        float(popart.normalize_advantage(state, adv)[0]), 2.0
    )
    np.testing.assert_allclose(
        float(popart.normalize_target(state, jnp.array([9.0]))[0]), 2.0
    )


def test_input_normalization_invariance():
    """(x-m)/s * a + b must be invariant under statistics updates."""
    norm = InputNormalization(rs.AverageMeanStd(), input_size=3)
    state = norm.init_state()
    params = norm.init_params()

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)

    def out(state, params, x):
        return norm.correct(params, norm.normalize(state, x))

    before = out(state, params, x)
    data = jnp.asarray(rng.normal(size=(20, 3)) * 4 - 2, jnp.float32)
    state2, params2 = norm.update_statistics(state, params, data)
    after = out(state2, params2, x)
    np.testing.assert_allclose(
        np.asarray(before), np.asarray(after), rtol=1e-4, atol=1e-4
    )


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
