"""SAC actor-critic networks.

Parity with /root/reference/agents/sac/networks.py ``ActorCriticMLP``
(:32-140): an actor MLP producing distribution parameters, ``n_critics``
Q-MLPs over concat(obs, action), and a V-MLP. Dict observations are
flattened by key order. The recurrent ``ActorCriticLSTM`` variant
(:143-382) is planned; the fused on-device design makes recurrent SAC a
straightforward extension of the same interface.

Exposed as one flax module with method-based application:
``net.apply(params, ..., method=net.get_q)`` etc., so a single parameter
tree serves all heads (matching the reference's single tf.Module).
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _concat_obs(observation):
    if isinstance(observation, dict):
        return jnp.concatenate(
            [
                jnp.asarray(v, jnp.float32)
                for _, v in sorted(observation.items())
            ],
            axis=-1,
        )
    return jnp.asarray(observation, jnp.float32)


class _MLP(nn.Module):
    sizes: Sequence[int]
    hidden_activation: Callable = nn.relu
    last_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes):
            x = nn.Dense(size)(x)
            if i < len(self.sizes) - 1:
                x = self.hidden_activation(x)
            elif self.last_activation is not None:
                x = self.last_activation(x)
        return x


class ActorCriticMLP(nn.Module):
    parametric_distribution_param_size: int
    n_critics: int = 2
    mlp_sizes: Sequence[int] = (256, 256)
    # Width of the action vector fed to the critics. Defaults to
    # param_size // 2 (loc/scale continuous distributions); discrete actions
    # are scalar, so pass action_dim=1 for categorical policies.
    action_dim: Optional[int] = None

    @property
    def stateless(self) -> bool:
        return True

    def initial_state(self, batch_size: int):
        del batch_size
        return ()

    def setup(self):
        self.actor_mlp = _MLP(
            tuple(self.mlp_sizes)
            + (self.parametric_distribution_param_size,),
            name="actor",
        )
        self.q_mlps = [
            _MLP(tuple(self.mlp_sizes) + (1,), name=f"q_{i}")
            for i in range(self.n_critics)
        ]
        self.v_mlp = _MLP(tuple(self.mlp_sizes) + (1,), name="v")

    def get_action_params(self, prev_action, env_output, state):
        del prev_action, state
        return self.actor_mlp(_concat_obs(env_output.observation))

    def get_v(self, prev_action, env_output, state):
        del prev_action, state
        return jnp.squeeze(
            self.v_mlp(_concat_obs(env_output.observation)), axis=-1
        )

    def get_q(self, prev_action, env_output, state, action):
        del prev_action, state
        obs = _concat_obs(env_output.observation)
        action = jnp.asarray(action, jnp.float32)
        if action.ndim < obs.ndim:
            action = action[..., None]
        inputs = jnp.concatenate([obs, action], axis=-1)
        return jnp.concatenate(
            [critic(inputs) for critic in self.q_mlps], axis=-1
        )

    def __call__(self, prev_action, env_output, state):
        """Step/init entry: returns ((action_params, v), state)."""
        action_params = self.get_action_params(prev_action, env_output, state)
        v = self.get_v(prev_action, env_output, state)
        # Touch the critics so a single init creates every head's params.
        action_dim = (
            self.action_dim
            if self.action_dim is not None
            else self.parametric_distribution_param_size // 2
        )
        zero_action = jnp.zeros(
            action_params.shape[:-1] + (action_dim,), jnp.float32
        )
        _ = self.get_q(prev_action, env_output, state, zero_action)
        return (action_params, v), state
