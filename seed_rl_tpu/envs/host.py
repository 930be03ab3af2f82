"""Host-side environment adapters for non-vectorizable (C++/gym) envs.

Parity with /root/reference/common/env_wrappers.py:
- ``UniformBoundActionSpaceWrapper`` (:45-69): rescale Box actions so the
  visible space is [-1, 1].
- ``DiscretizeEnvWrapper`` (:72-127): lin/log bucketing of continuous
  actions into a MultiDiscrete space.
- ``HostBatchedEnv`` replaces ``BatchedEnvironment`` (:130-214): N gym envs
  stepped on the host (optionally via a thread pool — MuJoCo/ALE release
  the GIL), auto-reset, with the EnvOutput transition contract
  (post-transition obs, post-reset when done, abandoned = gymnasium
  ``truncated``).

These feed the device through ``seed_rl_tpu.rollout_host`` — the residual
host↔device path of the architecture; pure-JAX envs use envs.core instead.
"""

import concurrent.futures
from typing import Callable, Optional

import gymnasium as gym
import numpy as np

from seed_rl_tpu.types import EnvOutput


class UniformBoundActionSpaceWrapper(gym.Wrapper):
    """Rescale actions so that action space bounds are [-1, 1]."""

    def __init__(self, env):
        super().__init__(env)
        assert isinstance(env.action_space, gym.spaces.Box)
        n = env.action_space.shape[0]
        self.half_range = (
            env.action_space.high - env.action_space.low
        ).astype(np.float32) / 2.0
        self.center = env.action_space.low.astype(np.float32) + self.half_range
        self.action_space = gym.spaces.Box(
            low=-np.ones(n, np.float32),
            high=np.ones(n, np.float32),
            dtype=np.float32,
        )

    def step(self, action):
        assert np.abs(action).max() < 1.00001, f"Action: {action}"
        action = np.clip(action, -1.0, 1.0)
        action = self.center + action * self.half_range
        return self.env.step(action)


class DiscretizeEnvWrapper(gym.Wrapper):
    """Discretize continuous actions into n buckets per dimension."""

    def __init__(self, env, n_actions_per_dim, discretization="lin",
                 action_ratio=None):
        super().__init__(env)
        assert len(env.action_space.shape) == 1
        dim_action = env.action_space.shape[0]
        self.action_space = gym.spaces.MultiDiscrete(
            [n_actions_per_dim] * dim_action
        )
        high = env.action_space.high
        high = high[0] if not np.isscalar(high) else high
        assert np.all(env.action_space.high == high)
        assert np.all(env.action_space.low == -env.action_space.high)
        if discretization == "log":
            assert n_actions_per_dim % 2 == 1, (
                "log discretization needs an odd number of buckets"
            )
            assert action_ratio is not None
            log_range = np.linspace(
                np.log(high / action_ratio), np.log(high),
                n_actions_per_dim // 2,
            )
            self.action_set = np.concatenate(
                [-np.exp(np.flip(log_range)), [0.0], np.exp(log_range)]
            )
        elif discretization == "lin":
            self.action_set = np.linspace(-high, high, n_actions_per_dim)
        else:
            raise ValueError(discretization)

    def step(self, action):
        action = np.take(self.action_set, action)
        return self.env.step(action)


class HostBatchedEnv:
    """N host gym envs with auto-reset, producing batched EnvOutput arrays.

    The per-env transition protocol matches the reference actor loop
    (common/actor.py:85-150): ``reset`` returns the first observation with
    reward 0 / done False; each ``step`` returns post-transition values with
    the post-reset observation when done; ``abandoned`` is gymnasium's
    ``truncated`` (TimeLimit), presented on the done transition exactly as
    the reference's abandoned-episode protocol expects.
    """

    def __init__(
        self,
        create_env_fn: Callable[[int], gym.Env],
        num_envs: int,
        num_threads: Optional[int] = None,
    ):
        self.envs = [create_env_fn(i) for i in range(num_envs)]
        self.num_envs = num_envs
        self._pool = (
            concurrent.futures.ThreadPoolExecutor(num_threads)
            if num_threads
            else None
        )
        self._episode_step = np.zeros(num_envs, np.int32)
        obs, _ = self.envs[0].reset(seed=0)
        self._obs_template = obs

    @property
    def action_space(self):
        return self.envs[0].action_space

    @property
    def observation_space(self):
        return self.envs[0].observation_space

    def observation_spec(self):
        import jax

        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), np.asarray(x).dtype
            ),
            self._obs_template,
        )

    def _stack_obs(self, obs_list):
        if isinstance(obs_list[0], dict):
            return {
                k: np.stack([o[k] for o in obs_list]) for k in obs_list[0]
            }
        return np.stack(obs_list)

    def reset(self, seed: int = 0) -> EnvOutput:
        def do_reset(i):
            obs, _ = self.envs[i].reset(seed=seed + i)
            return obs

        if self._pool is not None:
            obs_list = list(self._pool.map(do_reset, range(self.num_envs)))
        else:
            obs_list = [do_reset(i) for i in range(self.num_envs)]
        self._episode_step[:] = 0
        n = self.num_envs
        return EnvOutput(
            reward=np.zeros(n, np.float32),
            done=np.zeros(n, bool),
            observation=self._stack_obs(obs_list),
            abandoned=np.zeros(n, bool),
            episode_step=np.zeros(n, np.int32),
        )

    def step(self, actions: np.ndarray) -> EnvOutput:
        def do_step(i):
            obs, reward, terminated, truncated, _ = self.envs[i].step(
                actions[i]
            )
            done = terminated or truncated
            if done:
                obs, _ = self.envs[i].reset()
            return obs, reward, done, truncated

        if self._pool is not None:
            results = list(self._pool.map(do_step, range(self.num_envs)))
        else:
            results = [do_step(i) for i in range(self.num_envs)]

        obs_list, rewards, dones, truncs = zip(*results)
        self._episode_step += 1
        episode_step = self._episode_step.copy()
        dones = np.asarray(dones, bool)
        self._episode_step[dones] = 0
        return EnvOutput(
            reward=np.asarray(rewards, np.float32),
            done=dones,
            observation=self._stack_obs(list(obs_list)),
            abandoned=np.asarray(truncs, bool),
            episode_step=episode_step,
        )

    def close(self):
        for env in self.envs:
            env.close()
        if self._pool is not None:
            self._pool.shutdown()
