"""Configurable on-policy (PPO-family) learner: fused rollout + epoch SGD.

Capability parity with /root/reference/agents/policy_gradient/learner.py +
modules/ppo_training_step_utils.py:
- virtual batches: one on-device rollout produces ``num_envs`` unrolls =
  the reference's ``batch_size × batches_per_step`` virtual batch,
- ``epochs_per_step`` passes over the data, each split into
  ``batches_per_step`` minibatches,
- four batch modes (learner_flags.py:40-48): ``repeat`` (same minibatch
  order), ``shuffle`` (reshuffle unrolls per epoch), ``split`` (advantages
  once, unrolls flattened to transitions and shuffled) and
  ``split_with_advantage_recomputation`` (advantages recomputed per epoch),
- gradient clipping by global norm, Lagrange-coefficient clipping after each
  apply, PopArt statistics updates threaded through the epoch scan,
- observation-normalization statistics updated once per training step before
  the epochs (reference learner.py:862-865).

The reference's separate training/inference agent variable sets with the
zero-sum broadcast sync (learner.py:267-283, 733-769) are unnecessary: the
rollout of step k+1 simply closes over the params produced by step k.

Everything (rollout, epochs, minibatch SGD) is inside ONE jitted step:
epochs and minibatches are ``lax.scan``s, so 10 epochs × 32 minibatches
compiles to a single fused loop pair.
"""

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
    GeneralizedOnPolicyLoss,
)
from seed_rl_tpu.rollout import RolloutEngine, RolloutState
from seed_rl_tpu.utils import episode_stats

BATCH_MODES = (
    "repeat",
    "shuffle",
    "split",
    "split_with_advantage_recomputation",
)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    epochs_per_step: int = 1
    batch_mode: str = "split"
    batches_per_step: int = 1
    num_action_repeats: int = 1


class PPOTrainState(NamedTuple):
    params: Any  # {"net": agent-net flax params, "loss": loss-owned params}
    obs_norm: Any  # input-normalization tracker state (non-trained)
    norm_state: Any  # PopArt tracker state (non-trained)
    opt_state: Any
    rollout: RolloutState
    stats: episode_stats.EpisodeStatsState
    step: jnp.ndarray


class PPOLearner:
    def __init__(
        self,
        engine: RolloutEngine,
        agent,  # NormalizingPolicyAgent (or PolicyAgent-compatible)
        loss: GeneralizedOnPolicyLoss,
        config: PPOConfig,
        optimizer: optax.GradientTransformation,
    ):
        assert config.batch_mode in BATCH_MODES, config.batch_mode
        assert engine.overlap == 0
        self.engine = engine
        self.agent = agent
        self.loss = loss
        self.config = config
        self.optimizer = optimizer
        self._normalizing = (
            getattr(agent, "input_normalization", None) is not None
        )
        # NormalizingPolicyAgent consumes {"net": ...} wrapper params even
        # with normalization off; plain PolicyAgent (discrete/visual PPO
        # nets) takes raw flax params.
        self._wraps_params = hasattr(agent, "_transform")
        self._frames_per_step = (
            engine.unroll_length
            * engine.env.num_envs
            * config.num_action_repeats
        )
        if config.batch_mode.startswith("split"):
            n = engine.unroll_length * engine.env.num_envs
        else:
            n = engine.env.num_envs
        assert n % config.batches_per_step == 0, (n, config.batches_per_step)
        self._minibatch_size = n // config.batches_per_step

    # -- parameter plumbing --------------------------------------------------

    def _agent_params(self, trainable, obs_norm):
        if self._normalizing:
            return {"net": trainable["net"], "obs_norm": obs_norm}
        if self._wraps_params:
            return {"net": trainable["net"]}
        return trainable["net"]

    @property
    def frames_per_step(self):
        return self._frames_per_step

    def init(self, rng) -> PPOTrainState:
        init_rng, rollout_rng, env_rng = jax.random.split(rng, 3)
        if self.engine.is_host:
            env_output = jax.tree.map(
                jnp.asarray, self.engine.env.reset(seed=0)
            )
        else:
            _, env_output = self.engine.env.reset(env_rng)
        prev_action = self.engine._batch_zero_action(self.engine.env.num_envs)
        agent_params = self.agent.init_params(
            init_rng, prev_action, env_output
        )
        params = {
            "net": agent_params["net"]
            if isinstance(agent_params, dict) and "net" in agent_params
            else agent_params,
            "loss": self.loss.init_params(),
        }
        obs_norm = (
            agent_params.get("obs_norm", ())
            if isinstance(agent_params, dict)
            else ()
        )
        return PPOTrainState(
            params=params,
            obs_norm=obs_norm,
            norm_state=self.loss.init_norm_state(),
            opt_state=self.optimizer.init(params),
            # Host engines keep rollout state outside the jax train state.
            rollout=()
            if self.engine.is_host
            else self.engine.init(
                self._agent_params(params, obs_norm), rollout_rng
            ),
            stats=episode_stats.init(self.engine.env.num_envs),
            step=jnp.zeros((), jnp.int32),
        )

    # -- inner SGD machinery -------------------------------------------------

    def _minibatch_step(self, carry, minibatch, precomputed: bool):
        params, opt_state, obs_norm, norm_state, rng = carry
        rng, loss_rng = jax.random.split(rng)

        if precomputed:
            (agent_state, prev_actions, env_outputs, agent_outputs,
             targets, advantages) = minibatch
        else:
            agent_state, prev_actions, env_outputs, agent_outputs = minibatch
            targets = advantages = None

        def loss_fn(trainable):
            agent_params = self._agent_params(trainable, obs_norm)
            return self.loss(
                agent_params,
                trainable["loss"],
                norm_state,
                agent_state,
                prev_actions,
                env_outputs,
                agent_outputs,
                rng=loss_rng,
                normalized_targets=targets,
                normalized_advantages=advantages,
            )

        grads, aux = jax.grad(loss_fn, has_aux=True)(params)
        grad_norm = optax.global_norm(grads)
        # PopArt compensation reassignment happened functionally inside the
        # loss; apply gradient updates on top of the reassigned params
        # (matching the reference's assign-during-forward + apply order).
        params = dict(params, loss=aux.loss_params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = dict(
            params, loss=self.loss.postprocess_params(params["loss"])
        )
        logs = dict(aux.logs)
        logs["grad/norm"] = grad_norm
        return (params, opt_state, obs_norm, aux.norm_state, rng), logs

    def _gather(self, data, indices):
        agent_state, rest = data[0], data[1:]
        gathered = jax.tree.map(
            lambda t: jnp.take(t, indices, axis=1), rest
        )
        state = jax.tree.map(
            lambda t: jnp.take(t, indices, axis=0), agent_state
        )
        return (state,) + gathered

    def _epoch(self, carry, data, shuffle: bool, precomputed: bool):
        params, opt_state, obs_norm, norm_state, rng = carry
        rng, perm_rng = jax.random.split(rng)
        batch_dim = jax.tree.leaves(data[1])[0].shape[1]
        indices = (
            jax.random.permutation(perm_rng, batch_dim)
            if shuffle
            else jnp.arange(batch_dim)
        )
        indices = indices.reshape(self.config.batches_per_step, -1)

        def body(carry, idx):
            minibatch = self._gather(data, idx)
            return self._minibatch_step(carry, minibatch, precomputed)

        carry = (params, opt_state, obs_norm, norm_state, rng)
        carry, logs = jax.lax.scan(body, carry, indices)
        return carry, jax.tree.map(lambda m: jnp.mean(m, axis=0), logs)

    def _compute_and_split(self, params, obs_norm, norm_state, unroll_data,
                           rng):
        """Advantages once + flatten unrolls into transitions ([1, T*B])."""
        agent_state, prev_actions, env_outputs, agent_outputs = unroll_data
        assert agent_state == () or not jax.tree.leaves(agent_state), (
            "split batch modes do not support recurrent agent state; use "
            "shuffle or repeat (reference ppo_training_step_utils.py:83-86)"
        )
        agent_params = self._agent_params(params, obs_norm)
        (targets, advantages, new_norm_state, new_loss_params, logs) = (
            self.loss.compute_advantages(
                agent_params,
                params["loss"],
                norm_state,
                agent_state,
                prev_actions,
                env_outputs,
                agent_outputs,
                rng=rng,
            )
        )
        cut = jax.tree.map(
            lambda t: t[:-1], (prev_actions, env_outputs, agent_outputs)
        )

        def to_transitions(t):
            return t.reshape((1, t.shape[0] * t.shape[1]) + t.shape[2:])

        flat = jax.tree.map(to_transitions, cut + (targets, advantages))
        data = ((),) + flat
        return data, new_norm_state, new_loss_params, logs

    # -- the train step ------------------------------------------------------

    def rollout_params(self, state: PPOTrainState):
        """Parameters to run rollouts with (host-engine drivers use this)."""
        return self._agent_params(state.params, state.obs_norm)

    def train_step(self, state: PPOTrainState) -> Tuple[PPOTrainState, dict]:
        rollout_state, unroll = self.engine.rollout(
            self._agent_params(state.params, state.obs_norm), state.rollout
        )
        rng, step_rng = jax.random.split(rollout_state.rng)
        rollout_state = rollout_state._replace(rng=rng)
        state = state._replace(rollout=rollout_state)
        return self.update(state, unroll, step_rng)

    def update(
        self, state: PPOTrainState, unroll, step_rng
    ) -> Tuple[PPOTrainState, dict]:
        """Full PPO optimization pass on one collected unroll batch."""
        config = self.config
        params = state.params
        obs_norm = state.obs_norm
        norm_state = state.norm_state

        # Observation-normalization statistics update, once per step.
        if self._normalizing:
            agent_params = {"net": params["net"], "obs_norm": obs_norm}
            agent_params = self.agent.update_observation_normalization(
                agent_params, unroll.timesteps.env_output.observation
            )
            params = dict(params, net=agent_params["net"])
            obs_norm = agent_params["obs_norm"]

        ts = unroll.timesteps
        unroll_data = (
            unroll.agent_state,
            ts.prev_action,
            ts.env_output,
            ts.agent_output,
        )

        all_logs = {}
        mode = config.batch_mode

        if mode == "split":
            rng0, step_rng = jax.random.split(step_rng)
            data, norm_state, loss_params, adv_logs = (
                self._compute_and_split(
                    params, obs_norm, norm_state, unroll_data, rng0
                )
            )
            params = dict(params, loss=loss_params)
            all_logs.update(adv_logs)
            carry = (params, state.opt_state, obs_norm, norm_state, step_rng)

            def epoch_body(carry, _):
                return self._epoch(carry, data, shuffle=True,
                                   precomputed=True)

            carry, logs = jax.lax.scan(
                epoch_body, carry, None, length=config.epochs_per_step
            )
        elif mode == "split_with_advantage_recomputation":
            carry = (params, state.opt_state, obs_norm, norm_state, step_rng)

            def epoch_body(carry, _):
                params_e, opt_state_e, obs_norm_e, norm_state_e, rng_e = carry
                rng0, rng_e = jax.random.split(rng_e)
                data, norm_state_e, loss_params_e, _ = (
                    self._compute_and_split(
                        params_e, obs_norm_e, norm_state_e, unroll_data, rng0
                    )
                )
                params_e = dict(params_e, loss=loss_params_e)
                return self._epoch(
                    (params_e, opt_state_e, obs_norm_e, norm_state_e, rng_e),
                    data,
                    shuffle=True,
                    precomputed=True,
                )

            carry, logs = jax.lax.scan(
                epoch_body, carry, None, length=config.epochs_per_step
            )
        else:  # repeat / shuffle: advantages recomputed inside each loss call
            carry = (params, state.opt_state, obs_norm, norm_state, step_rng)

            def epoch_body(carry, _):
                return self._epoch(
                    carry,
                    unroll_data,
                    shuffle=(mode == "shuffle"),
                    precomputed=False,
                )

            carry, logs = jax.lax.scan(
                epoch_body, carry, None, length=config.epochs_per_step
            )

        params, opt_state, obs_norm, norm_state, _ = carry
        all_logs.update(
            jax.tree.map(lambda m: jnp.mean(m, axis=0), logs)
        )

        new_env_outputs = jax.tree.map(lambda x: x[1:], ts.env_output)
        stats = episode_stats.update(state.stats, new_env_outputs)

        new_state = state._replace(
            params=params,
            obs_norm=obs_norm,
            norm_state=norm_state,
            opt_state=opt_state,
            stats=stats,
            step=state.step + 1,
        )
        return new_state, all_logs

    def train_many(self, state: PPOTrainState, num_steps: int):
        def body(carry, _):
            carry, metrics = self.train_step(carry)
            return carry, metrics

        state, metrics = jax.lax.scan(body, state, None, length=num_steps)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
