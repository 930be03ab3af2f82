"""Synthetic on-device + host benchmark environments.

``SyntheticAtariEnv`` produces Atari-shaped uint8 frames (84x84x1, episodic,
sparse rewards) at negligible cost, so benchmarks measure the framework +
network throughput (the quantity BASELINE.md targets: env-frames/s per chip)
rather than emulator speed. Real Atari runs use the host ALE pool in
seed_rl_tpu.envs.atari.

``SyntheticAtariGymEnv`` is the host-process (gymnasium) twin: the same
observation/reward semantics as a plain numpy env, so the reference-scale
R2D2/V-trace host pipeline (HostBatchedEnv thread pool -> HostRolloutEngine
-> host-RAM replay) can be exercised end-to-end on machines without ale_py —
the stand-in named by the round-1 review for validating the host-env R2D2
path.
"""

from typing import NamedTuple, Optional, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.envs.core import JaxEnv, StepResult


class _SynthState(NamedTuple):
    t: jnp.ndarray
    seed: jnp.ndarray


class SyntheticAtariEnv(JaxEnv):
    """Cheap uint8-frame environment with Atari-like episode statistics."""

    def __init__(
        self,
        num_actions: int = 18,
        frame_shape: Tuple[int, int] = (84, 84),
        episode_length: int = 1000,
    ):
        self.num_actions = num_actions
        self.frame_shape = frame_shape
        self.episode_length = episode_length
        self._action_space = gym.spaces.Discrete(num_actions)

    def observation_spec(self):
        h, w = self.frame_shape
        return jax.ShapeDtypeStruct((h, w, 1), jnp.uint8)

    @property
    def action_space(self):
        return self._action_space

    def _obs(self, state):
        h, w = self.frame_shape
        # Data-dependent but nearly free: a per-step byte pattern.
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
        return ((row + state.t + state.seed) % 255).astype(jnp.uint8)

    def reset(self, rng):
        seed = jax.random.randint(rng, (), 0, 255)
        state = _SynthState(t=jnp.zeros((), jnp.int32), seed=seed)
        return state, self._obs(state)

    def step(self, state, action):
        t = state.t + 1
        new_state = _SynthState(t=t, seed=state.seed)
        reward = (action == (state.seed % self.num_actions)).astype(
            jnp.float32
        )
        return StepResult(
            state=new_state,
            observation=self._obs(new_state),
            reward=reward,
            terminated=t >= self.episode_length,
            abandoned=jnp.zeros((), bool),
        )


class SyntheticDmLabEnv(SyntheticAtariEnv):
    """DmLab-shaped frames: 72x96 RGB uint8 (reference dmlab/env.py obs),
    9-action discrete set (dmlab/env.py:44-54). The workload class of the
    SEED paper's DmLab throughput number — the 40k frames/s/chip anchor
    bench.py compares against — so benching ImpalaDeep on these shapes is
    the apples-to-apples vs_baseline comparison."""

    def __init__(
        self,
        num_actions: int = 9,
        frame_shape: Tuple[int, int] = (72, 96),
        episode_length: int = 1000,
    ):
        super().__init__(num_actions, frame_shape, episode_length)

    def observation_spec(self):
        h, w = self.frame_shape
        return jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)

    def _obs(self, state):
        h, w = self.frame_shape
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w, 3), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (h, w, 3), 2)
        return ((row + 37 * chan + state.t + state.seed) % 255).astype(
            jnp.uint8
        )


class SyntheticFootballEnv(SyntheticAtariEnv):
    """SMM-shaped bit-packed frames: [72, 96, 1] uint16 (the reference's
    wire format, football/observation.py:22-63), 19-action discrete set.
    The GFootball resnet unpacks the planes on device, so a rollout over
    these frames measures the full unpack + 4-stack-resnet data path."""

    def __init__(self, num_actions: int = 19, episode_length: int = 500):
        super().__init__(num_actions, (72, 96), episode_length)

    def observation_spec(self):
        h, w = self.frame_shape
        return jax.ShapeDtypeStruct((h, w, 1), jnp.uint16)

    def _obs(self, state):
        h, w = self.frame_shape
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
        return ((row + state.t + state.seed) % 65535).astype(jnp.uint16)


class SyntheticAtariGymEnv(gym.Env):
    """Host-process twin of ``SyntheticAtariEnv`` (gymnasium API).

    Atari-shaped uint8 frames; reward 1 for picking the episode's hidden
    action (encoded in the frame bytes), so a short training run has a
    learnable signal. Cheap enough that host-pipeline benchmarks measure
    the framework, not the emulator.
    """

    metadata = {"render_modes": []}

    def __init__(
        self,
        num_actions: int = 18,
        frame_shape: Tuple[int, int] = (84, 84),
        episode_length: int = 1000,
    ):
        self.num_actions = num_actions
        self.frame_shape = frame_shape
        self.episode_length = episode_length
        self.action_space = gym.spaces.Discrete(num_actions)
        h, w = frame_shape
        self.observation_space = gym.spaces.Box(
            0, 255, (h, w, 1), np.uint8
        )
        self._rng = np.random.default_rng(0)
        self._t = 0
        self._seed_val = 0
        h, w = frame_shape
        self._row = np.arange(h, dtype=np.int32).reshape(h, 1, 1)
        self._row = np.broadcast_to(self._row, (h, w, 1))

    def _obs(self):
        return ((self._row + self._t + self._seed_val) % 255).astype(
            np.uint8
        )

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._seed_val = int(self._rng.integers(0, 255))
        self._t = 0
        return self._obs(), {}

    def step(self, action):
        self._t += 1
        reward = float(int(action) == self._seed_val % self.num_actions)
        terminated = self._t >= self.episode_length
        return self._obs(), reward, terminated, False, {}
