"""Policy-value networks (V-trace/PPO family heads).

``MLPAndLSTM`` is the capability equivalent of the reference's V-trace agent
network (agents/vtrace/networks.py:25-121): MLP torso → stacked LSTM with
done reset → policy-logits + baseline heads. ``MLPPolicyNetwork`` is the
stateless variant (used when no memory is needed; its unroll folds time into
batch so everything lands on the MXU as one big matmul).

Networks are step-level flax modules: ``__call__(prev_action, env_output,
core_state) -> ((policy_params, baseline), new_core_state)`` on batch-major
``[B, ...]`` inputs. Action sampling lives in ``seed_rl_tpu.agent`` (the
reference samples inside the network head; here sampling needs explicit PRNG
keys and is the caller's job, which also lets training unrolls skip it).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seed_rl_tpu.models.core import LSTMStack, MLPTorso, lstm_initial_state


def _flatten_observation(observation) -> jnp.ndarray:
    """Concatenate a (possibly dict) observation into a flat f32 vector."""
    leaves = jax.tree.leaves(observation)
    batch_shape = leaves[0].shape[:1]
    flat = [
        leaf.astype(jnp.float32).reshape(batch_shape + (-1,))
        for leaf in leaves
    ]
    return flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)


class MLPAndLSTM(nn.Module):
    """MLP torso + stacked LSTM + (policy_params, baseline) heads."""

    parametric_distribution_param_size: int
    mlp_sizes: Sequence[int] = (64, 64)
    lstm_sizes: Sequence[int] = (64,)

    @property
    def stateless(self) -> bool:
        return False

    def initial_state(self, batch_size: int):
        return lstm_initial_state(self.lstm_sizes, batch_size)

    @nn.compact
    def __call__(
        self, prev_action, env_output, core_state
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Any]:
        del prev_action
        x = _flatten_observation(env_output.observation)
        x = MLPTorso(self.mlp_sizes)(x)
        x, core_state = LSTMStack(self.lstm_sizes)(
            x, core_state, env_output.done
        )
        policy_params = nn.Dense(
            self.parametric_distribution_param_size, name="policy_logits"
        )(x)
        baseline = jnp.squeeze(nn.Dense(1, name="baseline")(x), axis=-1)
        return (policy_params, baseline), core_state


class MLPPolicyNetwork(nn.Module):
    """Stateless MLP policy+value net (separate or shared torso)."""

    parametric_distribution_param_size: int
    mlp_sizes: Sequence[int] = (64, 64)
    shared_torso: bool = False
    activation: str = "tanh"

    @property
    def stateless(self) -> bool:
        return True

    def initial_state(self, batch_size: int):
        del batch_size
        return ()

    @nn.compact
    def __call__(
        self, prev_action, env_output, core_state
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Any]:
        del prev_action
        x = _flatten_observation(env_output.observation)
        if self.shared_torso:
            h = MLPTorso(self.mlp_sizes, self.activation)(x)
            policy_in, value_in = h, h
        else:
            policy_in = MLPTorso(
                self.mlp_sizes, self.activation, name="policy_torso"
            )(x)
            value_in = MLPTorso(
                self.mlp_sizes, self.activation, name="value_torso"
            )(x)
        policy_params = nn.Dense(
            self.parametric_distribution_param_size, name="policy_logits"
        )(policy_in)
        baseline = jnp.squeeze(nn.Dense(1, name="baseline")(value_in), axis=-1)
        return (policy_params, baseline), core_state
