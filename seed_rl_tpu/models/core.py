"""Shared network building blocks: MLP torsos and done-resetting LSTM stacks.

The LSTM reset semantics match the reference (agents/vtrace/networks.py:
104-118, atari/networks.py:176-218): when ``done`` is set at a timestep the
core state is reset to the initial (zero) state *before* that step's core
update, because the post-done observation is the first of the next episode.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def lstm_initial_state(
    lstm_sizes: Sequence[int], batch_size: int, dtype=jnp.float32
):
    """Zero carry for a stack of LSTM cells: tuple of (c, h) pairs."""
    return tuple(
        (
            jnp.zeros((batch_size, size), dtype),
            jnp.zeros((batch_size, size), dtype),
        )
        for size in lstm_sizes
    )


def reset_state_where_done(done, state, initial_state):
    """Per-batch-element select of the initial state where done is set."""

    def sel(init, cur):
        d = done.reshape(done.shape + (1,) * (cur.ndim - done.ndim))
        return jnp.where(d, init, cur)

    return jax.tree.map(sel, initial_state, state)


class MLPTorso(nn.Module):
    """Plain ReLU MLP (matches keras Dense 'relu' stacks in the reference)."""

    layer_sizes: Sequence[int]
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        x = x.astype(self.dtype)
        for size in self.layer_sizes:
            x = act(nn.Dense(size, dtype=self.dtype)(x))
        return x


class LSTMStack(nn.Module):
    """Stacked LSTM cells, single step, with done-masked state reset."""

    lstm_sizes: Sequence[int]

    def initial_state(self, batch_size: int):
        return lstm_initial_state(self.lstm_sizes, batch_size)

    @nn.compact
    def __call__(self, inputs, core_state, done) -> Tuple[jnp.ndarray, Tuple]:
        batch_size = inputs.shape[0]
        initial = lstm_initial_state(self.lstm_sizes, batch_size, inputs.dtype)
        core_state = reset_state_where_done(done, core_state, initial)
        x = inputs
        new_states = []
        for i, size in enumerate(self.lstm_sizes):
            cell = nn.OptimizedLSTMCell(size, name=f"lstm_{i}")
            carry, x = cell(core_state[i], x)
            new_states.append(carry)
        return x, tuple(new_states)
