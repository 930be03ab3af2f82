"""Rollout engine for host-resident environments (gym/MuJoCo/ALE).

The residual host↔device path of the architecture (SURVEY.md §7 "Env
vectorization"): env stepping happens on CPU in a ``HostBatchedEnv`` (thread
pool over C envs), policy inference runs as one jitted batched step on the
accelerator, and the finished ``[overlap+T+1, B]`` unroll lives on device
for the (separately jitted) learner ``update``. JAX's async dispatch
overlaps the device policy step with the host env step of the previous
batch.

Produces exactly the same ``Unroll`` structure and boundary-overlap
alignment as the on-device ``RolloutEngine``, so every learner's
``update(state, unroll)`` works unchanged with either engine.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.envs.host import HostBatchedEnv
from seed_rl_tpu.rollout import Timestep, Unroll, _zero_action_for_space


class HostRolloutState:
    """Mutable host-side rollout state (NOT a jax pytree)."""

    def __init__(self, env_output, agent_state, prev_action, rng):
        self.env_output = env_output  # numpy EnvOutput (next to process)
        self.agent_state = agent_state  # device arrays
        self.prev_action = prev_action  # device array
        self.rng = rng
        self.carry_timesteps = []  # last overlap+1 Timesteps (device)
        # Core state before the first timestep of the next unroll.
        self.unroll_first_state = agent_state
        self._captured_state = agent_state


class HostRolloutEngine:
    """Same contract as RolloutEngine, with env stepping on the host."""

    is_host = True

    def __init__(
        self,
        batched_env: HostBatchedEnv,
        agent,
        unroll_length: int,
        num_overlapping_steps: int = 0,
        deterministic: bool = False,
    ):
        assert unroll_length > num_overlapping_steps
        self.env = batched_env
        self.agent = agent
        self.unroll_length = unroll_length
        self.overlap = num_overlapping_steps
        self.deterministic = deterministic
        self._zero_action = _zero_action_for_space(batched_env.action_space)

        def policy_step(params, prev_action, env_output, core_state, rng):
            rng, key = jax.random.split(rng)
            agent_output, new_state = self.agent.policy_step(
                params, prev_action, env_output, core_state, key,
                deterministic=self.deterministic,
            )
            return agent_output, new_state, rng

        self._policy_step = jax.jit(policy_step)

    def _batch_zero_action(self, batch):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
            self._zero_action,
        )

    def init(self, params, rng, seed: int = 0) -> HostRolloutState:
        env_output = self.env.reset(seed=seed)
        batch = self.env.num_envs
        agent_state = self.agent.initial_state(batch)
        state = HostRolloutState(
            env_output=env_output,
            agent_state=agent_state,
            prev_action=self._batch_zero_action(batch),
            rng=rng,
        )
        # Prime overlap+1 timesteps so the first unroll covers genuine env
        # steps 0..o+T (same contract as RolloutEngine.init); the state
        # before env step 0 is the initial state.
        state.carry_timesteps = self._run_steps(
            params, state, self.overlap + 1, capture_at=None
        )
        state.unroll_first_state = agent_state
        return state

    def _run_steps(self, params, state, num_steps, capture_at: Optional[int]):
        timesteps = []
        for j in range(num_steps):
            if capture_at is not None and j == capture_at:
                state._captured_state = state.agent_state
            env_output_dev = jax.tree.map(jnp.asarray, state.env_output)
            agent_output, new_agent_state, rng = self._policy_step(
                params,
                state.prev_action,
                env_output_dev,
                state.agent_state,
                state.rng,
            )
            timesteps.append(
                Timestep(
                    prev_action=state.prev_action,
                    env_output=env_output_dev,
                    agent_output=agent_output,
                )
            )
            # Host env step with the freshly computed actions.
            state.env_output = self.env.step(np.asarray(agent_output.action))
            state.prev_action = agent_output.action
            state.agent_state = new_agent_state
            state.rng = rng
        return timesteps

    def rollout(self, params, state: HostRolloutState):
        """Advance T env steps; emit one [o+T+1, B] unroll on device."""
        new_timesteps = self._run_steps(
            params,
            state,
            self.unroll_length,
            capture_at=self.unroll_length - self.overlap - 1,
        )
        all_ts = state.carry_timesteps + new_timesteps
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *all_ts)
        unroll = Unroll(
            agent_state=state.unroll_first_state, timesteps=stacked
        )
        state.carry_timesteps = all_ts[-(self.overlap + 1):]
        state.unroll_first_state = state._captured_state
        return state, unroll
