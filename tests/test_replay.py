"""Prioritized replay + HER tests.

Mirrors /root/reference/tests/utils_test.py:304-486: FIFO wrap-around,
priority^exp sampling frequencies, importance-weight math, priority updates,
HER goal substitution and window subsampling.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from seed_rl_tpu.replay import HindsightExperienceReplay, PrioritizedReplay
from seed_rl_tpu.types import EnvOutput


def test_insert_wraps_around_fifo():
    replay = PrioritizedReplay(size=4, importance_sampling_exponent=0.6)
    state = replay.init_state(jnp.zeros((2,)))
    values = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    state, idx1 = replay.insert(state, values[:3], jnp.ones((3,)))
    np.testing.assert_array_equal(np.asarray(idx1), [0, 1, 2])
    state, idx2 = replay.insert(state, values[3:], jnp.ones((3,)))
    np.testing.assert_array_equal(np.asarray(idx2), [3, 0, 1])
    # Slots 0,1 were overwritten by items 4,5.
    np.testing.assert_array_equal(
        np.asarray(state.buffer[0]), np.asarray(values[4])
    )
    assert int(state.num_inserted) == 4  # saturates at size


def test_sample_respects_priorities():
    replay = PrioritizedReplay(size=4, importance_sampling_exponent=0.0)
    state = replay.init_state(jnp.zeros(()))
    state, _ = replay.insert(
        state,
        jnp.arange(4, dtype=jnp.float32),
        jnp.array([1.0, 0.0, 0.0, 3.0]),
    )
    _, _, items = replay.sample(
        state, jax.random.PRNGKey(0), 4000, priority_exp=1.0
    )
    freqs = np.bincount(np.asarray(items, np.int32), minlength=4) / 4000
    np.testing.assert_allclose(freqs, [0.25, 0.0, 0.0, 0.75], atol=0.03)


def test_sample_uniform_when_exp_zero():
    replay = PrioritizedReplay(size=8, importance_sampling_exponent=0.6)
    state = replay.init_state(jnp.zeros(()))
    state, _ = replay.insert(
        state, jnp.arange(4, dtype=jnp.float32), jnp.array([9.0, 1.0, 1.0, 1.0])
    )
    idx, weights, _ = replay.sample(
        state, jax.random.PRNGKey(1), 4000, priority_exp=0
    )
    # Only the 4 inserted slots are sampled, roughly uniformly.
    freqs = np.bincount(np.asarray(idx), minlength=8) / 4000
    assert np.all(freqs[4:] == 0)
    np.testing.assert_allclose(freqs[:4], 0.25, atol=0.04)
    np.testing.assert_array_equal(np.asarray(weights), 1.0)


def test_importance_weights_match_reference_formula():
    exp = 0.6
    replay = PrioritizedReplay(size=4, importance_sampling_exponent=exp)
    state = replay.init_state(jnp.zeros(()))
    priorities = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    state, _ = replay.insert(
        state, jnp.zeros((4,)), jnp.asarray(priorities)
    )
    priority_exp = 0.9
    idx, weights, _ = replay.sample(
        state, jax.random.PRNGKey(2), 1000, priority_exp=priority_exp
    )
    prob = priorities**priority_exp
    prob /= prob.sum()
    expected = ((1.0 / 4) / prob[np.asarray(idx)]) ** exp
    expected /= expected.max()
    np.testing.assert_allclose(np.asarray(weights), expected, rtol=1e-4)


def test_update_priorities():
    replay = PrioritizedReplay(size=4, importance_sampling_exponent=0.6)
    state = replay.init_state(jnp.zeros(()))
    state, _ = replay.insert(state, jnp.zeros((4,)), jnp.ones((4,)))
    state = replay.update_priorities(
        state, jnp.array([1, 3]), jnp.array([5.0, 7.0])
    )
    np.testing.assert_array_equal(
        np.asarray(state.priorities), [1.0, 5.0, 1.0, 7.0]
    )


class _Item(NamedTuple):
    agent_state: jnp.ndarray
    env_outputs: EnvOutput


def _make_her_items(batch, horizon, n_bits, rng):
    """Random goal-env windows, item-major [batch, horizon, ...]."""
    bits = jax.random.bernoulli(
        rng, 0.5, (batch, horizon, n_bits)
    ).astype(jnp.float32)
    desired = jnp.zeros((batch, horizon, n_bits))
    obs = {
        "achieved_goal": bits,
        "desired_goal": desired,
        "observation": jnp.zeros((batch, horizon, 3)),
    }
    # Stored rewards must be what the goal env itself would produce:
    # reward[t] = compute_reward(achieved[t], desired[t-1]).
    stored_reward = jnp.concatenate(
        [
            jnp.zeros((batch, 1)),
            _compute_reward(bits[:, 1:], desired[:, :-1]),
        ],
        axis=1,
    )
    return _Item(
        agent_state=jnp.zeros((batch, 2)),
        env_outputs=EnvOutput(
            reward=stored_reward,
            done=jnp.zeros((batch, horizon), bool),
            observation=obs,
            abandoned=jnp.zeros((batch, horizon), bool),
            episode_step=jnp.tile(
                jnp.arange(horizon, dtype=jnp.int32), (batch, 1)
            ),
        ),
    )


def _compute_reward(achieved_goal, desired_goal):
    return jnp.clip(
        -jnp.sum((achieved_goal != desired_goal).astype(jnp.float32), -1),
        -1.0,
        0.0,
    )


def test_her_substitutes_future_goals_and_fixes_rewards():
    horizon, n_bits, unroll = 8, 5, 3
    her = HindsightExperienceReplay(
        size=16,
        importance_sampling_exponent=0.0,
        compute_reward_fn=_compute_reward,
        unroll_length=unroll,
        substitution_probability=1.0,
    )
    items = _make_her_items(4, horizon, n_bits, jax.random.PRNGKey(0))
    one = jax.tree.map(lambda t: t[0], items)
    state = her.init_state(one)
    state, _ = her.insert(state, items, jnp.ones((4,)))

    _, _, sampled = her.sample(
        state, jax.random.PRNGKey(1), 6, priority_exp=0
    )
    obs = sampled.env_outputs.observation
    # Window length is unroll + 1.
    assert obs["achieved_goal"].shape == (6, unroll + 1, n_bits)
    assert sampled.agent_state.shape == (6, 2)  # not subsampled

    # With substitution probability 1 and no dones, every desired goal must
    # be an achieved goal from some later step (verify reward consistency):
    # reward[t] corresponds to transition t-1 -> t with desired[t-1].
    achieved = np.asarray(obs["achieved_goal"])
    desired = np.asarray(obs["desired_goal"])
    reward = np.asarray(sampled.env_outputs.reward)
    want = np.asarray(
        _compute_reward(
            jnp.asarray(achieved[:, 1:]), jnp.asarray(desired[:, :-1])
        )
    )
    np.testing.assert_allclose(reward[:, 1:], want, atol=1e-6)


def test_her_no_substitution_when_probability_zero():
    horizon, n_bits, unroll = 6, 4, 2
    her = HindsightExperienceReplay(
        size=8,
        importance_sampling_exponent=0.0,
        compute_reward_fn=_compute_reward,
        unroll_length=unroll,
        substitution_probability=0.0,
    )
    items = _make_her_items(3, horizon, n_bits, jax.random.PRNGKey(2))
    one = jax.tree.map(lambda t: t[0], items)
    state = her.init_state(one)
    state, _ = her.insert(state, items, jnp.ones((3,)))
    _, _, sampled = her.sample(
        state, jax.random.PRNGKey(3), 5, priority_exp=0
    )
    obs = sampled.env_outputs.observation
    # Goals are untouched...
    np.testing.assert_allclose(np.asarray(obs["desired_goal"]), 0.0)
    # ...and so are the rewards (still consistent with the stored goals).
    want = np.asarray(
        _compute_reward(
            jnp.asarray(obs["achieved_goal"][:, 1:]),
            jnp.asarray(obs["desired_goal"][:, :-1]),
        )
    )
    np.testing.assert_allclose(
        np.asarray(sampled.env_outputs.reward)[:, 1:], want, atol=1e-6
    )


def test_multi_axis_items_stored_flat():
    """Multi-axis item leaves live as [size, flat] (layout-neutral 2D: XLA
    would otherwise propagate a consumer layout through the sample gather
    onto the whole buffer and relayout it on every sample), and round-trip
    back to their item shape on sample."""
    replay = PrioritizedReplay(size=6, importance_sampling_exponent=0.5)
    item = {"frames": jnp.zeros((5, 4, 3), jnp.uint8), "r": jnp.zeros((5,))}
    state = replay.init_state(item)
    assert state.buffer["frames"].shape == (6, 60)
    assert state.buffer["r"].shape == (6, 5)  # 1D items stay structured
    values = {
        "frames": jnp.arange(2 * 60, dtype=jnp.uint8).reshape(2, 5, 4, 3),
        "r": jnp.ones((2, 5)),
    }
    state, _ = replay.insert(state, values, jnp.ones((2,)))
    _, _, items = replay.sample(
        state, jax.random.PRNGKey(0), 3, priority_exp=1.0
    )
    assert items["frames"].shape == (3, 5, 4, 3)
    assert items["r"].shape == (3, 5)
    # Every sampled item is one of the two inserted values, bit-for-bit.
    flat = np.asarray(items["frames"]).reshape(3, -1)
    for row in flat:
        assert (row == np.asarray(values["frames"][0]).ravel()).all() or (
            row == np.asarray(values["frames"][1]).ravel()
        ).all()


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
