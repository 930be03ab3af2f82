"""Dueling (LSTM) DQN over vector observations.

Same head/recurrence structure as the Atari DuelingLSTMDQNNet
(/root/reference/atari/networks.py:221-340) with an MLP torso instead of the
conv stack — used for non-image R2D2 tasks and fast CPU tests.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seed_rl_tpu.models.core import (
    MLPTorso,
    lstm_initial_state,
    reset_state_where_done,
)
from seed_rl_tpu.types import QAgentOutput


class VectorDuelingDQNNet(nn.Module):
    num_actions: int
    mlp_sizes: Sequence[int] = (64,)
    lstm_size: int = 64
    hidden_size: int = 64

    @property
    def stateless(self) -> bool:
        return False

    def initial_state(self, batch_size: int):
        return lstm_initial_state((self.lstm_size,), batch_size)

    @nn.compact
    def __call__(self, prev_action, env_output, core_state):
        obs = env_output.observation
        if isinstance(obs, dict):
            obs = jnp.concatenate(
                [jnp.asarray(v, jnp.float32) for _, v in sorted(obs.items())],
                axis=-1,
            )
        x = MLPTorso(self.mlp_sizes)(jnp.asarray(obs, jnp.float32))
        x = jnp.concatenate(
            [
                x,
                env_output.reward[..., None],
                jax.nn.one_hot(prev_action, self.num_actions),
            ],
            axis=-1,
        )
        done = env_output.done
        core_state = reset_state_where_done(
            done,
            core_state,
            lstm_initial_state((self.lstm_size,), done.shape[0]),
        )
        cell = nn.OptimizedLSTMCell(self.lstm_size, name="lstm")
        new_core, x = cell(core_state[0], x)

        value = nn.Dense(1, name="value_head")(
            nn.relu(nn.Dense(self.hidden_size, name="hidden_value")(x))
        )
        advantage = nn.Dense(
            self.num_actions, use_bias=False, name="advantage_head"
        )(nn.relu(nn.Dense(self.hidden_size, name="hidden_advantage")(x)))
        advantage = advantage - jnp.mean(advantage, axis=-1, keepdims=True)
        q_values = value + advantage
        action = jnp.argmax(q_values, axis=-1).astype(jnp.int32)
        return QAgentOutput(action, q_values), (new_core,)
