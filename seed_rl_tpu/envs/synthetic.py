"""Synthetic on-device benchmark environments.

``SyntheticAtariEnv`` produces Atari-shaped uint8 frames (84x84x1, episodic,
sparse rewards) at negligible cost, so benchmarks measure the framework +
network throughput (the quantity BASELINE.md targets: env-frames/s per chip)
rather than emulator speed. Real Atari runs use the host ALE pool in
seed_rl_tpu.envs.atari.
"""

from typing import NamedTuple, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp

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
