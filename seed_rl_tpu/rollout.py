"""On-device batched rollout engine — the heart of the TPU-native design.

Replaces the reference's entire inference data-plane: the gRPC streaming loop
(common/actor.py:108 + grpc/ops/grpc.cc DynamicFn batching), the per-env
``UnrollStore`` scatter buffers (common/utils.py:119-257) and the
``Aggregator`` state stores (common/utils.py:461-543). Here a single
``lax.scan`` under ``jit`` advances B vectorized envs for T steps, producing
the exact same time-major ``[overlap + T + 1, B]`` unroll structure the
reference's learners consume — including the R2D2 burn-in overlap carryover
(reference ``_complete_unrolls``, common/utils.py:240-256) and the stored
core state at each unroll's first timestep.

Unroll alignment matches the reference's UnrollStore contract: consecutive
unrolls share ``overlap + 1`` boundary timesteps; unroll k covers global env
steps ``k*T .. k*T + overlap + T``.
"""

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from seed_rl_tpu.envs.core import BatchedEnv, BatchedEnvState
from seed_rl_tpu.types import EnvOutput


class Timestep(NamedTuple):
    """One completed timestep: action entering, obs seen, output produced."""

    prev_action: Any
    env_output: EnvOutput
    agent_output: Any


class Unroll(NamedTuple):
    """Training input: [overlap+T+1, B] timesteps + initial core state."""

    agent_state: Any  # core state before the unroll's first timestep
    timesteps: Timestep


class RolloutState(NamedTuple):
    env_state: BatchedEnvState
    env_output: EnvOutput  # next observation to process
    agent_state: Any  # current core state
    prev_action: Any
    carry_timesteps: Timestep  # last overlap+1 completed timesteps
    next_unroll_state: Any  # core state at the next unroll's first timestep
    rng: jnp.ndarray


def _concat_time(a, b):
    return jax.tree.map(
        lambda x, y: jnp.concatenate([x, y], axis=0), a, b
    )


def _tail_time(tree, n):
    return jax.tree.map(lambda x: x[-n:], tree)


def _tree_select(pred, on_true, on_false):
    return jax.tree.map(
        lambda a, b: jnp.where(pred, a, b) if a.ndim == 0
        else jnp.where(
            jnp.reshape(pred, (1,) * a.ndim), a, b
        ),
        on_true,
        on_false,
    )


class RolloutEngine:
    is_host = False

    """Generates fixed-length unrolls by stepping envs + policy on device.

    Args:
      batched_env: a ``BatchedEnv`` (auto-resetting, vectorized).
      agent: object with ``policy_step(params, prev_action, env_output,
        core_state, rng[, deterministic])`` and ``initial_state(batch)``.
        (``PolicyAgent`` or the R2D2 epsilon-greedy agent.)
      unroll_length: T — new timesteps per unroll.
      num_overlapping_steps: o — timesteps shared with the previous unroll in
        addition to the +1 boundary step (R2D2 burn-in).
      zero_action: example action pytree for one env (un-batched).
    """

    def __init__(
        self,
        batched_env: BatchedEnv,
        agent,
        unroll_length: int,
        num_overlapping_steps: int = 0,
        zero_action=None,
        deterministic: bool = False,
    ):
        assert unroll_length > num_overlapping_steps, (
            "unroll_length must exceed the overlap (reference UnrollStore "
            "has the same constraint)"
        )
        self.env = batched_env
        self.agent = agent
        self.unroll_length = unroll_length
        self.overlap = num_overlapping_steps
        # Deterministic inference for eval (reference PPO
        # host.deterministic_inference, learner.py:486-488).
        self.deterministic = deterministic
        if zero_action is None:
            zero_action = _zero_action_for_space(batched_env.action_space)
        self._zero_action = zero_action

    def _batch_zero_action(self, batch):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
            self._zero_action,
        )

    def _scan_step(self, params, carry, _):
        (
            env_state,
            env_output,
            agent_state,
            prev_action,
            next_unroll_state,
            step_idx,
            rng,
        ) = carry
        rng, action_key = jax.random.split(rng)

        # Capture the core state at the timestep that will start the *next*
        # unroll (scan step T - overlap - 1 of each T-step segment).
        capture = step_idx == (self.unroll_length - self.overlap - 1)
        next_unroll_state = _tree_select(capture, agent_state, next_unroll_state)

        # named_scope = the jax.profiler equivalent of the reference's C++
        # profiler::TraceMe annotations (grpc/ops/grpc.cc:1153-1156): the
        # stages show up by name in captured device traces.
        with jax.named_scope("rollout_policy_step"):
            agent_output, new_agent_state = self.agent.policy_step(
                params, prev_action, env_output, agent_state, action_key,
                deterministic=self.deterministic,
            )
        timestep = Timestep(
            prev_action=prev_action,
            env_output=env_output,
            agent_output=agent_output,
        )
        with jax.named_scope("rollout_env_step"):
            new_env_state, new_env_output = self.env.step(
                env_state, agent_output.action
            )
        new_carry = (
            new_env_state,
            new_env_output,
            new_agent_state,
            agent_output.action,
            next_unroll_state,
            step_idx + 1,
            rng,
        )
        return new_carry, timestep

    def init(self, params, rng) -> RolloutState:
        """Reset envs and prime the first ``overlap+1`` timesteps.

        Priming makes the first unroll cover genuine env steps 0..o+T (no
        zero padding), matching the reference store's first completed unroll.
        """
        env_rng, prime_rng = jax.random.split(rng)
        env_state, env_output = self.env.reset(env_rng)
        batch = self.env.num_envs
        agent_state = self.agent.initial_state(batch)
        prev_action = self._batch_zero_action(batch)

        scan_fn = functools.partial(self._scan_step, params)
        carry = (
            env_state,
            env_output,
            agent_state,
            prev_action,
            agent_state,  # next_unroll_state: state before timestep 0
            jnp.array(-(self.overlap + 1), jnp.int32),  # never hits capture
            prime_rng,
        )
        carry, primed = jax.lax.scan(
            scan_fn, carry, None, length=self.overlap + 1
        )
        (env_state, env_output, agent_state, prev_action, _, _, rng) = carry
        return RolloutState(
            env_state=env_state,
            env_output=env_output,
            agent_state=agent_state,
            prev_action=prev_action,
            carry_timesteps=primed,
            next_unroll_state=self.agent.initial_state(batch),
            rng=rng,
        )

    def rollout(self, params, state: RolloutState):
        """Advance T env steps; emit one [o+T+1, B] unroll.

        Returns (new_state, Unroll).
        """
        scan_fn = functools.partial(self._scan_step, params)
        carry = (
            state.env_state,
            state.env_output,
            state.agent_state,
            state.prev_action,
            state.next_unroll_state,
            jnp.zeros((), jnp.int32),
            state.rng,
        )
        carry, new_timesteps = jax.lax.scan(
            scan_fn, carry, None, length=self.unroll_length
        )
        (
            env_state,
            env_output,
            agent_state,
            prev_action,
            next_unroll_state,
            _,
            rng,
        ) = carry

        unroll_timesteps = _concat_time(state.carry_timesteps, new_timesteps)
        unroll = Unroll(
            agent_state=state.next_unroll_state, timesteps=unroll_timesteps
        )
        new_state = RolloutState(
            env_state=env_state,
            env_output=env_output,
            agent_state=agent_state,
            prev_action=prev_action,
            carry_timesteps=_tail_time(unroll_timesteps, self.overlap + 1),
            next_unroll_state=next_unroll_state,
            rng=rng,
        )
        return new_state, unroll


def _zero_action_for_space(space):
    """Zero action pytree for a single env from a gymnasium space."""
    import gymnasium as gym

    if isinstance(space, gym.spaces.Discrete):
        return jnp.zeros((), jnp.int32)
    if isinstance(space, gym.spaces.MultiDiscrete):
        return jnp.zeros((len(space.nvec),), jnp.int32)
    if isinstance(space, gym.spaces.Box):
        return jnp.zeros(space.shape, jnp.float32)
    if isinstance(space, gym.spaces.Tuple):
        # Joint distributions emit concatenated float actions (see
        # distributions.JointDistribution).
        width = 0
        for sub in space.spaces:
            if isinstance(sub, gym.spaces.Discrete):
                width += 1
            elif isinstance(sub, gym.spaces.MultiDiscrete):
                width += len(sub.nvec)
            else:
                width += sub.shape[0]
        return jnp.zeros((width,), jnp.float32)
    raise ValueError(f"Unsupported action space {space}")
