"""Functional environment protocol + vectorized auto-resetting batching.

This is the TPU-native replacement for the reference's actor fleet: instead of
thin CPU actors streaming per-step inference RPCs
(/root/reference/common/actor.py:45-185 + grpc/), environments are pure JAX
functions stepped in lockstep on device under ``jit``. Batching is the leading
axis of the env-state pytree — the role played by the C++ dynamic batcher in
the reference (grpc/ops/grpc.cc:591-861) is played here by ``jax.vmap``.

The per-transition data contract is the reference's
``EnvOutput = (reward, done, observation, abandoned, episode_step)``
(common/utils.py:39-42): ``observation`` is post-transition, and post-reset
when ``done`` — auto-reset happens inside ``BatchedEnv.step`` so downstream
code never sees a terminal observation (algorithms bootstrap from values/state
carried before the reset, exactly as the reference's actors present it).
"""

import abc
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from seed_rl_tpu.types import EnvOutput


class StepResult(NamedTuple):
    state: Any
    observation: Any
    reward: jnp.ndarray
    terminated: jnp.ndarray  # bool: proper episode termination
    abandoned: jnp.ndarray  # bool: episode cut short (e.g. time limit)


class JaxEnv(abc.ABC):
    """A single pure-functional environment.

    State is an arbitrary pytree; implementations keep any PRNG state they
    need inside it. All methods must be trace-compatible (static shapes).
    """

    @abc.abstractmethod
    def observation_spec(self):
        """Pytree of ``jax.ShapeDtypeStruct`` for a single observation."""

    @property
    @abc.abstractmethod
    def action_space(self):
        """A gymnasium space describing a single action."""

    @abc.abstractmethod
    def reset(self, rng) -> Tuple[Any, Any]:
        """Returns (state, observation) for a fresh episode."""

    @abc.abstractmethod
    def step(self, state, action) -> StepResult:
        """Advances one step. Must NOT auto-reset (the wrapper does)."""


class TimeLimit(JaxEnv):
    """Abandons (not terminates) episodes after ``max_episode_steps``.

    Mirrors gym TimeLimit + the reference's abandoned-episode protocol
    (common/actor.py:119-143): hitting the limit sets ``abandoned`` so
    abandoned-aware estimators can bootstrap instead of treating it as a
    terminal state.
    """

    def __init__(self, env: JaxEnv, max_episode_steps: int):
        self._env = env
        self._limit = max_episode_steps

    def observation_spec(self):
        return self._env.observation_spec()

    @property
    def action_space(self):
        return self._env.action_space

    def reset(self, rng):
        state, obs = self._env.reset(rng)
        return (state, jnp.zeros((), jnp.int32)), obs

    def step(self, state, action):
        inner_state, t = state
        result = self._env.step(inner_state, action)
        t = t + 1
        abandoned = jnp.logical_and(t >= self._limit, ~result.terminated)
        return StepResult(
            state=(result.state, t),
            observation=result.observation,
            reward=result.reward,
            terminated=result.terminated,
            abandoned=jnp.logical_or(result.abandoned, abandoned),
        )


class BatchedEnvState(NamedTuple):
    env_state: Any  # [B, ...] stacked single-env states
    episode_step: jnp.ndarray  # i32[B]
    rng: jnp.ndarray  # key used to seed auto-resets


def _tree_where(pred, on_true, on_false):
    """Select whole sub-pytrees per batch element (pred is [B])."""

    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)

    return jax.tree.map(sel, on_true, on_false)


class BatchedEnv:
    """Vectorizes a ``JaxEnv`` over a leading batch axis with auto-reset.

    Replaces the reference's ``BatchedEnvironment`` (common/env_wrappers.py:
    130-214, sequential host loop) with a single vmapped device step.
    """

    def __init__(self, env: JaxEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self._vreset = jax.vmap(env.reset)
        self._vstep = jax.vmap(env.step)

    def observation_spec(self):
        return self.env.observation_spec()

    @property
    def action_space(self):
        return self.env.action_space

    def reset(self, rng) -> Tuple[BatchedEnvState, EnvOutput]:
        reset_rng, state_rng = jax.random.split(rng)
        states, obs = self._vreset(jax.random.split(state_rng, self.num_envs))
        batch = self.num_envs
        env_output = EnvOutput(
            reward=jnp.zeros((batch,), jnp.float32),
            done=jnp.zeros((batch,), bool),
            observation=obs,
            abandoned=jnp.zeros((batch,), bool),
            episode_step=jnp.zeros((batch,), jnp.int32),
        )
        return BatchedEnvState(
            env_state=states,
            episode_step=jnp.zeros((batch,), jnp.int32),
            rng=reset_rng,
        ), env_output

    def step(
        self, state: BatchedEnvState, action
    ) -> Tuple[BatchedEnvState, EnvOutput]:
        result = self._vstep(state.env_state, action)
        done = jnp.logical_or(result.terminated, result.abandoned)
        episode_step = state.episode_step + 1

        # Auto-reset: compute fresh states unconditionally (cheap for JAX
        # envs, fuses into the step) and select per env where done.
        rng, reset_rng = jax.random.split(state.rng)
        reset_states, reset_obs = self._vreset(
            jax.random.split(reset_rng, self.num_envs)
        )
        new_env_state = _tree_where(done, reset_states, result.state)
        observation = _tree_where(done, reset_obs, result.observation)

        env_output = EnvOutput(
            reward=result.reward.astype(jnp.float32),
            done=done,
            observation=observation,
            # Post-reset episode_step mirrors the reference's env_infos
            # accounting: the step count reported on the done transition is
            # the completed episode's length.
            episode_step=episode_step,
            abandoned=result.abandoned,
        )
        return BatchedEnvState(
            env_state=new_env_state,
            episode_step=jnp.where(done, 0, episode_step),
            rng=rng,
        ), env_output
