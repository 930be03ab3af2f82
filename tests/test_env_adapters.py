"""Tests for Atari preprocessing, football bit packing, DmLab scores,
frame stacking and the resnet model family.

Mirrors reference tests: football/observation_test.py (bit-pack round
trip), atari/networks_test.py (frame-stacking done-masking semantics),
dmlab/games.py score math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seed_rl_tpu.envs import dmlab
from seed_rl_tpu.envs.atari import pool_and_resize_frames
from seed_rl_tpu.envs.football import PackedBitsObservation, unpackbits
from seed_rl_tpu.models.atari import (
    initial_frame_stacking_state,
    stack_frame,
)
from seed_rl_tpu.models.resnets import GFootball, ImpalaDeep
from seed_rl_tpu.types import EnvOutput


def test_football_bitpack_roundtrip():
    rng = np.random.RandomState(0)
    planes = rng.randint(0, 2, (7, 5, 35)).astype(np.uint8)

    class DummyEnv:
        import gymnasium as gym

        observation_space = gym.spaces.Box(0, 1, (7, 5, 35), np.uint8)

    wrapper = PackedBitsObservation.__new__(PackedBitsObservation)
    import gymnasium as gym

    wrapper.observation_space = gym.spaces.Box(
        0, np.iinfo(np.uint16).max, (7, 5, 3), np.uint16
    )
    packed = PackedBitsObservation.observation(wrapper, planes)
    assert packed.dtype == np.uint16
    assert packed.shape == (7, 5, (35 + 15) // 16)

    unpacked = np.asarray(unpackbits(jnp.asarray(packed)))
    np.testing.assert_array_equal(
        unpacked[..., :35], planes.astype(np.float32) * 255
    )
    # Padding bits decode to zero.
    np.testing.assert_array_equal(unpacked[..., 35:], 0.0)


def test_atari_pool_and_resize():
    rng = np.random.RandomState(0)
    f0 = rng.randint(0, 255, (210, 160)).astype(np.uint8)
    f1 = rng.randint(0, 255, (210, 160)).astype(np.uint8)
    out = pool_and_resize_frames(f0, f1, 84)
    assert out.shape == (84, 84, 1)
    assert out.dtype == np.uint8
    # Max-pooling happens BEFORE the resize: constant frames stay constant.
    const0 = np.full((210, 160), 10, np.uint8)
    const1 = np.full((210, 160), 200, np.uint8)
    out2 = pool_and_resize_frames(const0, const1, 84)
    np.testing.assert_array_equal(out2, 200)


def test_atari_create_environment_gated():
    from seed_rl_tpu.envs import atari

    with pytest.raises(ImportError, match="ale_py"):
        atari.create_environment("Pong")


def test_dmlab_human_normalized_score():
    score = dmlab.human_normalized_score("rooms_watermaze", [54.0])
    np.testing.assert_allclose(score, 100.0, rtol=1e-5)
    score = dmlab.human_normalized_score("rooms_watermaze", [4.065])
    np.testing.assert_allclose(score, 0.0, atol=1e-5)
    assert len(dmlab.DMLAB_30) == 30
    assert len(dmlab.HUMAN_SCORES) == 30
    assert set(dmlab.HUMAN_SCORES) == set(dmlab.RANDOM_SCORES)


def test_frame_stacking_done_masking():
    """Mirrors atari/networks_test.py:186-251 semantics."""
    B, H, W = 2, 4, 4
    stack = 3
    state = initial_frame_stacking_state(stack, B, (H, W))

    def frame(v):
        return np.full((B, H, W, 1), v, np.uint8)

    done = jnp.zeros((B,), bool)
    stacked1, state = stack_frame(jnp.asarray(frame(1)), state, done, stack)
    # History is zeros, newest frame last.
    np.testing.assert_array_equal(np.asarray(stacked1[..., -1]), 1)
    np.testing.assert_array_equal(np.asarray(stacked1[..., :-1]), 0)

    stacked2, state = stack_frame(jnp.asarray(frame(2)), state, done, stack)
    np.testing.assert_array_equal(
        np.asarray(stacked2[0, 0, 0]), [0, 1, 2]
    )

    # done on env 0 resets ITS history only.
    done = jnp.array([True, False])
    stacked3, state = stack_frame(jnp.asarray(frame(3)), state, done, stack)
    np.testing.assert_array_equal(np.asarray(stacked3[0, 0, 0]), [0, 0, 3])
    np.testing.assert_array_equal(np.asarray(stacked3[1, 0, 0]), [1, 2, 3])


def _env_output(batch, frame_shape, channels, discrete_frames=True):
    h, w = frame_shape
    dtype = jnp.uint8 if discrete_frames else jnp.uint16
    return EnvOutput(
        reward=jnp.zeros((batch,)),
        done=jnp.zeros((batch,), bool),
        observation=jnp.zeros((batch, h, w, channels), dtype),
        abandoned=jnp.zeros((batch,), bool),
        episode_step=jnp.zeros((batch,), jnp.int32),
    )


def test_impala_deep_forward():
    net = ImpalaDeep(num_actions=9)
    B = 2
    env_output = _env_output(B, (72, 96), 3)
    prev_action = jnp.zeros((B,), jnp.int32)
    state = net.initial_state(B)
    params = net.init(jax.random.PRNGKey(0), prev_action, env_output, state)
    (logits, baseline), new_state = net.apply(
        params, prev_action, env_output, state
    )
    assert logits.shape == (B, 9)
    assert baseline.shape == (B,)
    assert new_state[0][0].shape == (B, 256)


def test_impala_deep_remat_matches_no_remat():
    """remat=True is a pure memory/FLOPs trade: outputs and gradients are
    identical to the stored-activation path (same params)."""
    B = 2
    env_output = _env_output(B, (24, 32), 3)
    prev_action = jnp.zeros((B,), jnp.int32)
    net = ImpalaDeep(num_actions=9)
    net_r = ImpalaDeep(num_actions=9, remat=True)
    state = net.initial_state(B)
    params = net.init(jax.random.PRNGKey(0), prev_action, env_output, state)

    def loss(n, p):
        (logits, baseline), _ = n.apply(p, prev_action, env_output, state)
        return jnp.sum(logits**2) + jnp.sum(baseline**2)

    # remat re-structures the flax param tree identically (same names).
    l0, g0 = jax.value_and_grad(lambda p: loss(net, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(net_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_synthetic_dmlab_env_shapes():
    """SyntheticDmLabEnv: DmLab-shaped 72x96x3 uint8 frames, 9 actions,
    rollout-compatible (the bench.py dmlab_vtrace workload)."""
    from seed_rl_tpu.envs import BatchedEnv
    from seed_rl_tpu.envs.synthetic import SyntheticDmLabEnv

    env = BatchedEnv(SyntheticDmLabEnv(), 3)
    assert env.observation_spec().shape == (72, 96, 3)
    assert int(env.action_space.n) == 9
    state, out = env.reset(jax.random.PRNGKey(0))
    obs = out.observation
    assert obs.shape == (3, 72, 96, 3) and obs.dtype == jnp.uint8
    state, out2 = env.step(state, jnp.zeros((3,), jnp.int32))
    assert out2.observation.shape == (3, 72, 96, 3)
    # Frames vary across channels and steps (not a constant tensor).
    assert int(jnp.sum(out2.observation != obs)) > 0


def test_gfootball_net_forward_with_packed_obs():
    net = GFootball(parametric_distribution_param_size=19)
    B = 2
    env_output = _env_output(B, (72, 96), 2, discrete_frames=False)
    prev_action = jnp.zeros((B,), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), prev_action, env_output, ())
    (logits, baseline), _ = net.apply(params, prev_action, env_output, ())
    assert logits.shape == (B, 19)
    assert baseline.shape == (B,)


def test_atari_nets_step_matches_time_major_unroll():
    """Folded-torso training path == sequential step path (shared params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seed_rl_tpu.models.atari import AtariPolicyNet, DuelingLSTMDQNNet
    from seed_rl_tpu.types import EnvOutput

    t, b = 5, 3
    rng = jax.random.PRNGKey(0)
    frames = jax.random.randint(rng, (t, b, 84, 84, 1), 0, 256, jnp.int32)
    frames = frames.astype(jnp.uint8)
    done = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3, (t, b))
    env_outputs = EnvOutput(
        reward=jax.random.normal(jax.random.PRNGKey(2), (t, b)),
        done=done,
        observation=frames,
        abandoned=jnp.zeros((t, b), bool),
        episode_step=jnp.zeros((t, b), jnp.int32),
    )
    prev_actions = jax.random.randint(
        jax.random.PRNGKey(3), (t, b), 0, 6, jnp.int32
    )

    for net in (
        DuelingLSTMDQNNet(num_actions=6, lstm_size=32),
        AtariPolicyNet(
            parametric_distribution_param_size=6, lstm_size=32
        ),
    ):
        step0 = jax.tree.map(lambda x: x[0], (prev_actions, env_outputs))
        state0 = net.initial_state(b)
        params = net.init(jax.random.PRNGKey(4), step0[0], step0[1], state0)

        # Sequential step path.
        state = net.initial_state(b)
        outs = []
        for i in range(t):
            pa, eo = jax.tree.map(lambda x: x[i], (prev_actions, env_outputs))
            out, state = net.apply(params, pa, eo, state)
            outs.append(out)
        stepwise = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        # Time-major fast path.
        fast, fast_state = net.apply(
            params, prev_actions, env_outputs, net.initial_state(b),
            method=net.unroll_time_major,
        )
        for a, b_ in zip(jax.tree.leaves(stepwise), jax.tree.leaves(fast)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5
            )
        for a, b_ in zip(
            jax.tree.leaves(state), jax.tree.leaves(fast_state)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5
            )


def test_dmlab_level_cache(tmp_path):
    """Reference dmlab/env.py:57-80 fetch/write contract."""
    cache = dmlab.LevelCache(str(tmp_path / "cache"))
    pk3 = tmp_path / "level.pk3"
    pk3.write_bytes(b"compiled-level-bytes")
    out = tmp_path / "restored.pk3"

    # Miss before write.
    assert not cache.fetch("seed:42:map1", str(out))
    cache.write("seed:42:map1", str(pk3))
    # Hit after write; bytes round-trip.
    assert cache.fetch("seed:42:map1", str(out))
    assert out.read_bytes() == b"compiled-level-bytes"
    # Keys are md5-fanned into 3-char subdirs.
    path = cache.get_path("seed:42:map1")
    import os
    rel = os.path.relpath(path, str(tmp_path / "cache"))
    head, tail = rel.split(os.sep)
    assert len(head) == 3 and len(head + tail) == 32
    # Re-write of an existing key is a no-op (no error).
    cache.write("seed:42:map1", str(pk3))
