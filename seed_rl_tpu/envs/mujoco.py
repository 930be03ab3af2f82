"""MuJoCo/Gym environment factory.

Parity with /root/reference/mujoco/env.py:29-110: creates a gymnasium env,
rescales Box actions to [-1, 1] (UniformBoundActionSpaceWrapper), optionally
discretizes them (lin/log), and casts observations to float32. The
reference's toy envs live in seed_rl_tpu.envs.toy as pure-JAX envs.
"""

from typing import Optional

import gymnasium as gym
import numpy as np

from seed_rl_tpu.envs.host import (
    DiscretizeEnvWrapper,
    UniformBoundActionSpaceWrapper,
)


class SinglePrecisionWrapper(gym.ObservationWrapper):
    def __init__(self, env):
        super().__init__(env)
        space = env.observation_space
        if isinstance(space, gym.spaces.Box):
            self.observation_space = gym.spaces.Box(
                low=space.low.astype(np.float32),
                high=space.high.astype(np.float32),
                dtype=np.float32,
            )

    def observation(self, observation):
        return np.asarray(observation, np.float32)


def create_environment(
    env_name: str = "HalfCheetah-v5",
    discretization: str = "none",
    n_actions_per_dim: int = 11,
    action_ratio: Optional[float] = 30.0,
    seed: Optional[int] = None,
) -> gym.Env:
    """Creates a MuJoCo/Gym env with the reference's wrapper stack."""
    env = gym.make(env_name)
    env = SinglePrecisionWrapper(env)
    if isinstance(env.action_space, gym.spaces.Box):
        env = UniformBoundActionSpaceWrapper(env)
        if discretization != "none":
            env = DiscretizeEnvWrapper(
                env,
                n_actions_per_dim,
                discretization,
                action_ratio,
            )
    if seed is not None:
        env.reset(seed=seed)
    return env
