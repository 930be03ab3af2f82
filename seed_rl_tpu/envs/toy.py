"""Pure-JAX toy environments for algorithm sanity tests.

Behavioral parity with /root/reference/mujoco/toy_env.py:
- ``ToyEnv`` (:23-53): observe a random target vector, reward is the negative
  squared distance between the action and the *previous* observation's target.
- ``ToyMemoryEnv`` (:56-97): targets are only visible for the first `horizon`
  steps and must be reproduced from memory afterwards.
- ``BitFlippingEnv`` (:100-137): goal-conditioned bit flipping (HER test bed,
  https://arxiv.org/pdf/1707.01495.pdf) with dict observations
  {achieved_goal, desired_goal, observation}.

These are CPU-runnable and also serve as the reference configs' "PR-1" env
(BASELINE.json config[0]).
"""

from typing import NamedTuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.envs.core import JaxEnv, StepResult


class _ToyState(NamedTuple):
    t: jnp.ndarray
    target: jnp.ndarray  # the random vector the action should match
    rng: jnp.ndarray


class ToyEnv(JaxEnv):
    """Match the observed random vector with your action."""

    def __init__(self, horizon: int = 3, n_actions: int = 3):
        self.horizon = horizon
        self.n_actions = n_actions
        self._action_space = gym.spaces.Box(
            -1.0, 1.0, [n_actions], dtype=np.float32
        )

    def observation_spec(self):
        return jax.ShapeDtypeStruct((self.n_actions + 1,), jnp.float32)

    @property
    def action_space(self):
        return self._action_space

    def _obs(self, target):
        return jnp.concatenate([target, jnp.zeros((1,), jnp.float32)])

    def reset(self, rng):
        rng, sub = jax.random.split(rng)
        target = jax.random.uniform(
            sub, (self.n_actions,), jnp.float32, -1.0, 1.0
        )
        state = _ToyState(t=jnp.zeros((), jnp.int32), target=target, rng=rng)
        return state, self._obs(target)

    def step(self, state, action):
        reward = -jnp.sum(jnp.square(action - state.target))
        rng, sub = jax.random.split(state.rng)
        target = jax.random.uniform(
            sub, (self.n_actions,), jnp.float32, -1.0, 1.0
        )
        t = state.t + 1
        return StepResult(
            state=_ToyState(t=t, target=target, rng=rng),
            observation=self._obs(target),
            reward=reward,
            terminated=t >= self.horizon,
            abandoned=jnp.zeros((), bool),
        )


class _ToyMemoryState(NamedTuple):
    t: jnp.ndarray
    memory: jnp.ndarray  # [horizon, n_actions] targets drawn at reset


class ToyMemoryEnv(JaxEnv):
    """Reproduce targets observed ``horizon`` steps ago (recurrence test)."""

    def __init__(self, horizon: int = 3, n_actions: int = 3):
        self.horizon = horizon
        self.n_actions = n_actions
        self._action_space = gym.spaces.Box(
            -1.0, 1.0, [n_actions], dtype=np.float32
        )

    def observation_spec(self):
        return jax.ShapeDtypeStruct((self.n_actions + 1,), jnp.float32)

    @property
    def action_space(self):
        return self._action_space

    def _obs(self, state):
        visible = state.t < self.horizon
        idx = jnp.minimum(state.t, self.horizon - 1)
        mem = jnp.where(visible, state.memory[idx], 0.0)
        return jnp.concatenate([mem, jnp.zeros((1,), jnp.float32)])

    def reset(self, rng):
        memory = jax.random.uniform(
            rng, (self.horizon, self.n_actions), jnp.float32, -1.0, 1.0
        )
        state = _ToyMemoryState(t=jnp.zeros((), jnp.int32), memory=memory)
        return state, self._obs(state)

    def step(self, state, action):
        t = state.t
        # Recall phase: reward for matching the target seen `horizon` ago.
        recall_idx = jnp.clip(t - self.horizon, 0, self.horizon - 1)
        recall_reward = -jnp.sum(
            jnp.square(action - state.memory[recall_idx])
        )
        reward = jnp.where(t < self.horizon, 0.0, recall_reward)
        terminated = t >= 2 * self.horizon
        reward = jnp.where(terminated, 0.0, reward)
        new_state = _ToyMemoryState(t=t + 1, memory=state.memory)
        return StepResult(
            state=new_state,
            observation=self._obs(new_state),
            reward=reward,
            terminated=terminated,
            abandoned=jnp.zeros((), bool),
        )


class _BitFlippingState(NamedTuple):
    bits: jnp.ndarray  # f32[n_bits]
    goal: jnp.ndarray  # f32[n_bits]
    t: jnp.ndarray


class BitFlippingEnv(JaxEnv):
    """Goal-conditioned bit flipping; dict obs for HER."""

    def __init__(self, n_bits: int = 10, horizon: int = 20):
        self.n_bits = n_bits
        self.horizon = horizon
        self._action_space = gym.spaces.Discrete(n_bits + 1)

    def observation_spec(self):
        return {
            "achieved_goal": jax.ShapeDtypeStruct(
                (self.n_bits,), jnp.float32
            ),
            "desired_goal": jax.ShapeDtypeStruct((self.n_bits,), jnp.float32),
            "observation": jax.ShapeDtypeStruct(
                (self.horizon + 1,), jnp.float32
            ),
        }

    @property
    def action_space(self):
        return self._action_space

    def _obs(self, state):
        return {
            "achieved_goal": state.bits,
            "desired_goal": state.goal,
            "observation": jax.nn.one_hot(
                state.t, self.horizon + 1, dtype=jnp.float32
            ),
        }

    @staticmethod
    def compute_reward(achieved_goal, desired_goal):
        """clip(-#mismatched bits, -1, 0) — used for HER relabeling too."""
        mismatches = jnp.sum(
            (achieved_goal != desired_goal).astype(jnp.float32), axis=-1
        )
        return jnp.clip(-mismatches, -1.0, 0.0)

    def reset(self, rng):
        bits_key, goal_key = jax.random.split(rng)
        bits = jax.random.bernoulli(bits_key, 0.5, (self.n_bits,)).astype(
            jnp.float32
        )
        goal = jax.random.bernoulli(goal_key, 0.5, (self.n_bits,)).astype(
            jnp.float32
        )
        state = _BitFlippingState(
            bits=bits, goal=goal, t=jnp.zeros((), jnp.int32)
        )
        return state, self._obs(state)

    def step(self, state, action):
        # Action n_bits is a no-op; otherwise flip the addressed bit.
        flip = jax.nn.one_hot(action, self.n_bits, dtype=jnp.float32)
        is_noop = action >= self.n_bits
        bits = jnp.where(is_noop, state.bits, jnp.abs(state.bits - flip))
        t = state.t + 1
        new_state = _BitFlippingState(bits=bits, goal=state.goal, t=t)
        return StepResult(
            state=new_state,
            observation=self._obs(new_state),
            reward=self.compute_reward(bits, state.goal),
            terminated=t >= self.horizon,
            abandoned=jnp.zeros((), bool),
        )


class _MatchState(NamedTuple):
    t: jnp.ndarray
    target: jnp.ndarray  # current target action
    rng: jnp.ndarray


class DiscreteMatchEnv(JaxEnv):
    """Observe a one-hot target, be rewarded for playing it (DQN test env)."""

    def __init__(self, n_actions: int = 4, horizon: int = 10):
        self.n_actions = n_actions
        self.horizon = horizon
        self._action_space = gym.spaces.Discrete(n_actions)

    def observation_spec(self):
        return jax.ShapeDtypeStruct((self.n_actions,), jnp.float32)

    @property
    def action_space(self):
        return self._action_space

    def reset(self, rng):
        rng, sub = jax.random.split(rng)
        target = jax.random.randint(sub, (), 0, self.n_actions)
        state = _MatchState(t=jnp.zeros((), jnp.int32), target=target, rng=rng)
        return state, jax.nn.one_hot(target, self.n_actions)

    def step(self, state, action):
        reward = (action == state.target).astype(jnp.float32)
        rng, sub = jax.random.split(state.rng)
        target = jax.random.randint(sub, (), 0, self.n_actions)
        t = state.t + 1
        return StepResult(
            state=_MatchState(t=t, target=target, rng=rng),
            observation=jax.nn.one_hot(target, self.n_actions),
            reward=reward,
            terminated=t >= self.horizon,
            abandoned=jnp.zeros((), bool),
        )
