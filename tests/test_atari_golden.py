"""Golden test: our AtariPreprocessing vs the reference implementation.

Loads /root/reference/atari/atari_preprocessing.py directly (with a stub
``gym`` module for its one Box import) and runs BOTH preprocessors over the
same deterministic fake-ALE dynamics: every numeric detail of this pipeline
is load-bearing for Atari curve parity (SURVEY §7 "hard parts" — grayscale
max-pool order, cv2 bilinear resize, frame-skip accounting, life-loss
termination, random no-ops). Frames must match byte-for-byte and rewards/
terminals must agree step-for-step. No ALE needed.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference/atari/atari_preprocessing.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE), reason="reference checkout not present"
)


def _load_reference_module():
    if "gym" not in sys.modules:
        gym_mod = types.ModuleType("gym")
        spaces_mod = types.ModuleType("gym.spaces")
        box_mod = types.ModuleType("gym.spaces.box")

        class Box:  # minimal stand-in for the one reference import
            def __init__(self, low, high, shape, dtype):
                self.low, self.high = low, high
                self.shape, self.dtype = shape, dtype

        box_mod.Box = Box
        spaces_mod.box = box_mod
        gym_mod.spaces = spaces_mod
        sys.modules["gym"] = gym_mod
        sys.modules["gym.spaces"] = spaces_mod
        sys.modules["gym.spaces.box"] = box_mod
    spec = importlib.util.spec_from_file_location(
        "reference_atari_preprocessing", REFERENCE
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


class _Core:
    """Deterministic ALE-like dynamics shared by both API stubs.

    Screen = f(frame counter); reward = action + 0.5 per raw frame; one
    life lost at raw frames 9 and 17; game over at raw frame 25.
    """

    H, W = 64, 48

    def __init__(self):
        self.t = 0
        self.resets = 0

    def reset(self):
        self.t = 0
        self.resets += 1

    def step(self, action):
        self.t += 1
        reward = float(action) + 0.5
        game_over = self.t >= 25
        return reward, game_over

    def lives(self):
        if self.t >= 17:
            return 1
        if self.t >= 9:
            return 2
        return 3

    def screen(self, out):
        y = np.arange(self.H, dtype=np.int64)[:, None]
        x = np.arange(self.W, dtype=np.int64)[None, :]
        out[:] = ((y * 7 + x * 3 + self.t * 31) % 256).astype(np.uint8)
        return out


class _FakeALE:
    def __init__(self, core):
        self._core = core

    def lives(self):
        return self._core.lives()

    def getScreenGrayscale(self, output):
        return self._core.screen(output)


class _SpaceStub:
    def __init__(self, shape):
        self.shape = shape


class _OldGymEnv:
    """Reference-facing stub: old-gym 4-tuple API + .np_random + .ale."""

    def __init__(self, core, noop_seed=None):
        self._core = core
        self.ale = _FakeALE(core)
        self.observation_space = _SpaceStub((core.H, core.W, 3))
        self.action_space = _SpaceStub((1,))
        self.np_random = np.random.RandomState(noop_seed)

    def reset(self):
        self._core.reset()

    def step(self, action):
        reward, game_over = self._core.step(action)
        return None, reward, game_over, {}

    def close(self):
        pass


class _GymnasiumEnv:
    """Our-facing stub: gymnasium 5-tuple API + .unwrapped.ale."""

    def __init__(self, core):
        self._core = core
        self.observation_space = _SpaceStub((core.H, core.W, 3))
        self.action_space = _SpaceStub((1,))
        self.unwrapped = types.SimpleNamespace(ale=_FakeALE(core))

    def reset(self, seed=None, options=None):
        self._core.reset()
        return None, {}

    def step(self, action):
        reward, game_over = self._core.step(action)
        return None, reward, game_over, False, {}

    def close(self):
        pass


def _run_pair(terminal_on_life_loss, max_random_noops, seed, actions):
    from seed_rl_tpu.envs.atari import AtariPreprocessing

    ref_mod = _load_reference_module()
    ref = ref_mod.AtariPreprocessing(
        _OldGymEnv(_Core(), noop_seed=seed),
        frame_skip=4,
        terminal_on_life_loss=terminal_on_life_loss,
        screen_size=84,
        max_random_noops=max_random_noops,
    )
    ours = AtariPreprocessing(
        _GymnasiumEnv(_Core()),
        frame_skip=4,
        terminal_on_life_loss=terminal_on_life_loss,
        screen_size=84,
        max_random_noops=max_random_noops,
    )

    ref_obs = ref.reset()
    our_obs, _ = ours.reset(seed=seed)
    np.testing.assert_array_equal(our_obs, ref_obs)

    for action in actions:
        r_obs, r_rew, r_term, _ = ref.step(action)
        o_obs, o_rew, o_term, o_trunc, _ = ours.step(action)
        assert not o_trunc
        assert o_rew == r_rew
        assert o_term == r_term
        np.testing.assert_array_equal(o_obs, r_obs)
        if r_term:
            ref_obs = ref.reset()
            our_obs, _ = ours.reset(seed=seed)
            np.testing.assert_array_equal(our_obs, ref_obs)


def test_frames_rewards_terminals_match_reference():
    _run_pair(
        terminal_on_life_loss=False,
        max_random_noops=0,
        seed=None,
        actions=[1, 0, 2, 3, 0, 1, 2, 0, 1, 3],
    )


def test_life_loss_termination_matches_reference():
    _run_pair(
        terminal_on_life_loss=True,
        max_random_noops=0,
        seed=None,
        actions=[0, 1, 2, 3, 0, 1, 2, 3, 0, 1],
    )


def test_random_noops_match_reference_with_same_rng():
    # Reference draws no-ops from environment.np_random; ours from the
    # reset(seed) RNG — seeding both with the same value must give the
    # same no-op counts and therefore identical frames.
    _run_pair(
        terminal_on_life_loss=False,
        max_random_noops=10,
        seed=123,
        actions=[1, 2, 0, 3, 1, 0],
    )


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
