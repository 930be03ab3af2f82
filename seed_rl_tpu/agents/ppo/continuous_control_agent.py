"""Continuous-control policy/value network + normalizing agent wrapper.

Parity with /root/reference/agents/policy_gradient/modules/
continuous_control_agent.py: configurable MLP policy/value (shared or
separate torsos), optional stacked-LSTM core with done-masked reset,
residual connections, layer normalization, swish default activation,
orthogonal initialization with per-head gain scaling (the ppo.gin config:
hidden sqrt(2), policy 0.01, value 1.0), ``std_independent_of_input`` (the
Gaussian std as a free trainable vector concatenated to the mean head), and
observation normalization with optional clipping and trainable compensation
("correct_observations").

The input-normalization *tracker statistics* are non-trained state owned by
the agent wrapper (they ride in the PPO train state and update once per
training step, reference learner.py:862-865); the trainable compensation
affine lives inside the network parameters at a fixed path so the
statistics-update reassignment can reach it.
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seed_rl_tpu.agent import PolicyAgent, batch_apply
from seed_rl_tpu.agents.ppo.input_normalization import InputNormalization
from seed_rl_tpu.models.core import lstm_initial_state, reset_state_where_done
from seed_rl_tpu.types import AgentOutput, EnvOutput


def swish(x):
    return x * jax.nn.sigmoid(x)


def orthogonal(gain: float = 1.0):
    return nn.initializers.orthogonal(scale=gain)


class _MLPBlock(nn.Module):
    num_layers: int
    num_units: int
    kernel_init: Callable
    activation: Callable
    use_layer_norm: bool
    residual: bool

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            h = x
            if self.use_layer_norm:
                h = nn.LayerNorm()(h)
            h = self.activation(
                nn.Dense(self.num_units, kernel_init=self.kernel_init)(h)
            )
            x = x + h if (self.residual and i > 0) else h
        return x


class ContinuousControlNet(nn.Module):
    """MLP (+optional LSTM) net with policy-params and baseline heads."""

    parametric_distribution_param_size: int
    num_layers_policy: int = 3
    num_layers_value: int = 3
    num_layers_rnn: int = 0
    num_units_policy: int = 256
    num_units_value: int = 256
    num_units_rnn: int = 256
    use_layer_norm: bool = False
    shared: bool = False
    residual_connections: bool = False
    activation: Callable = swish
    kernel_init_gain: Optional[float] = None  # None = glorot_uniform
    last_kernel_init_policy_gain: Optional[float] = None
    last_kernel_init_value_gain: Optional[float] = None
    correct_observations: bool = False
    std_independent_of_input: bool = False

    @property
    def stateless(self) -> bool:
        return self.num_layers_rnn == 0

    def initial_state(self, batch_size: int):
        if self.num_layers_rnn == 0:
            return ()
        return lstm_initial_state(
            (self.num_units_rnn,) * self.num_layers_rnn, batch_size
        )

    def _kernel_init(self, gain):
        if gain is None:
            return nn.initializers.glorot_uniform()
        return orthogonal(gain)

    @nn.compact
    def __call__(self, prev_action, env_output: EnvOutput, core_state):
        del prev_action
        obs = env_output.observation
        if isinstance(obs, dict):
            obs = jnp.concatenate(
                [jnp.asarray(v, jnp.float32) for _, v in sorted(obs.items())],
                axis=-1,
            )
        obs = jnp.asarray(obs, jnp.float32)

        if self.correct_observations:
            # Trainable compensation affine at a fixed parameter path (see
            # input_normalization.InputNormalization.correct).
            scale = self.param(
                "obs_correction_scale",
                nn.initializers.ones,
                (obs.shape[-1],),
            )
            bias = self.param(
                "obs_correction_bias",
                nn.initializers.zeros,
                (obs.shape[-1],),
            )
            obs = scale * obs + bias

        hidden_init = self._kernel_init(self.kernel_init_gain)

        if self.shared:
            assert self.num_layers_policy == self.num_layers_value
            assert self.num_units_policy == self.num_units_value
            shared_out = _MLPBlock(
                self.num_layers_policy,
                self.num_units_policy,
                hidden_init,
                self.activation,
                self.use_layer_norm,
                self.residual_connections,
                name="shared_torso",
            )(obs)
            policy_in = value_in = shared_out
        else:
            policy_in = _MLPBlock(
                self.num_layers_policy,
                self.num_units_policy,
                hidden_init,
                self.activation,
                self.use_layer_norm,
                self.residual_connections,
                name="policy_torso",
            )(obs)
            value_in = _MLPBlock(
                self.num_layers_value,
                self.num_units_value,
                hidden_init,
                self.activation,
                self.use_layer_norm,
                self.residual_connections,
                name="value_torso",
            )(obs)

        if self.num_layers_rnn:
            done = env_output.done
            sizes = (self.num_units_rnn,) * self.num_layers_rnn
            initial = lstm_initial_state(sizes, done.shape[0])
            core_state = reset_state_where_done(done, core_state, initial)
            new_states = []
            x = policy_in
            for i, size in enumerate(sizes):
                cell = nn.OptimizedLSTMCell(size, name=f"lstm_{i}")
                carry, x = cell(core_state[i], x)
                new_states.append(carry)
            policy_in = value_in = x
            core_state = tuple(new_states)

        policy_out_size = self.parametric_distribution_param_size
        if self.std_independent_of_input:
            policy_out_size //= 2
        policy_params = nn.Dense(
            policy_out_size,
            kernel_init=self._kernel_init(self.last_kernel_init_policy_gain),
            name="policy_head",
        )(policy_in)
        if self.std_independent_of_input:
            free_std = self.param(
                "free_log_std", nn.initializers.zeros, (policy_out_size,)
            )
            policy_params = jnp.concatenate(
                [
                    policy_params,
                    jnp.broadcast_to(
                        free_std, policy_params.shape[:-1] + free_std.shape
                    ),
                ],
                axis=-1,
            )

        baseline = jnp.squeeze(
            nn.Dense(
                1,
                kernel_init=self._kernel_init(
                    self.last_kernel_init_value_gain
                ),
                name="value_head",
            )(value_in),
            axis=-1,
        )
        return (policy_params, baseline), core_state


class NormalizingPolicyAgent(PolicyAgent):
    """PolicyAgent that normalizes (and clips) observations before the net.

    Parameter structure: ``{"net": flax params, "obs_norm": tracker state}``.
    The tracker state rides inside "params" so the rollout engine threads it
    opaquely; the PPO learner masks it out of the optimizer and updates it
    once per training step via ``update_observation_normalization``.
    """

    def __init__(
        self,
        net,
        distribution,
        input_normalization: Optional[InputNormalization] = None,
        input_clipping: Optional[float] = None,
    ):
        super().__init__(net, distribution)
        self.input_normalization = input_normalization
        self.input_clipping = input_clipping

    def init_params(self, rng, prev_action, env_output):
        params = {"net": super().init_params(rng, prev_action, env_output)}
        if self.input_normalization is not None:
            params["obs_norm"] = self.input_normalization.init_state()
        return params

    def _transform(self, params, env_output: EnvOutput) -> EnvOutput:
        obs = env_output.observation
        if self.input_normalization is not None:
            obs = self.input_normalization.normalize(params["obs_norm"], obs)
        if self.input_clipping is not None:
            obs = jnp.clip(obs, -self.input_clipping, self.input_clipping)
        return env_output._replace(observation=obs)

    def policy_step(
        self, params, prev_action, env_output, core_state, rng,
        deterministic=False,
    ):
        return super().policy_step(
            params["net"],
            prev_action,
            self._transform(params, env_output),
            core_state,
            rng,
            deterministic,
        )

    def unroll(self, params, prev_actions, env_outputs, core_state):
        return super().unroll(
            params["net"],
            prev_actions,
            self._transform(params, env_outputs),
            core_state,
        )

    def update_observation_normalization(self, params, observations):
        """Returns params with updated tracker stats + compensation reassign.

        ``observations``: [T, B, obs_size] raw observations from the unroll.
        """
        if self.input_normalization is None:
            return params
        norm = self.input_normalization
        net_params = params["net"]
        if self.net.correct_observations:
            comp = {
                "compensation_mean": net_params["params"][
                    "obs_correction_bias"
                ],
                "compensation_std": net_params["params"][
                    "obs_correction_scale"
                ],
            }
            new_state, new_comp = norm.update_statistics(
                params["obs_norm"], comp, observations
            )
            new_net = dict(net_params)
            new_net["params"] = dict(
                net_params["params"],
                obs_correction_bias=new_comp["compensation_mean"],
                obs_correction_scale=new_comp["compensation_std"],
            )
            return {"net": new_net, "obs_norm": new_state}
        new_state = norm.tracker.update(params["obs_norm"], observations)
        return dict(params, obs_norm=new_state)
