"""Generalized on-policy loss: advantage estimator × policy loss × regularizer
× PopArt reward normalization.

Parity with /root/reference/agents/policy_gradient/modules/
generalized_onpolicy_loss.py:
- ``compute_advantages`` (:65-141): reward clip/scale, abandoned-aware
  done_terminated/done_abandoned split, frame-skip-adjusted discount,
  optional regularization-in-returns, PopArt-corrected/unnormalized value
  predictions for bootstrapping, and PopArt statistics update.
- ``__call__`` (:143-226): policy loss on normalized advantages, value loss
  (MSE or Huber) with optional PPO-style value clipping against the
  behaviour-policy baseline, regularizer per-step + adjustment losses.

Functional conventions: trainable loss-owned parameters (PopArt
compensation, Lagrange coefficients, V-MPO temperature) come from
``init_params``; non-trained normalizer statistics from ``init_norm_state``.
Every call returns ``(loss, aux)`` where aux carries logs and the updated
state/params so the caller can thread them.
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from seed_rl_tpu.ops.popart import PopArt


class LossAux(NamedTuple):
    logs: dict
    norm_state: Any
    loss_params: Any


def _huber(x, delta):
    abs_x = jnp.abs(x)
    return jnp.where(
        abs_x <= delta, 0.5 * jnp.square(x), delta * (abs_x - 0.5 * delta)
    )


class GeneralizedOnPolicyLoss:
    def __init__(
        self,
        agent,
        reward_normalizer: Optional[PopArt],
        parametric_action_distribution,
        advantage_estimator,
        policy_loss,
        discount_factor: float,
        regularizer=None,
        max_abs_reward: Optional[float] = None,
        handle_abandoned_episodes_properly: bool = True,
        huber_delta: Optional[float] = None,
        value_ppo_style_clip_eps: Optional[float] = None,
        baseline_cost: float = 1.0,
        include_regularization_in_returns: bool = False,
        frame_skip: int = 1,
        reward_scaling: float = 1.0,
    ):
        self.agent = agent
        self.reward_normalizer = reward_normalizer
        self.dist = parametric_action_distribution
        self.advantage_estimator = advantage_estimator
        self.policy_loss = policy_loss
        self.regularizer = regularizer
        self.max_abs_reward = max_abs_reward
        self.reward_scaling = reward_scaling
        self.baseline_cost = baseline_cost
        self.discount_factor = discount_factor
        self.frame_skip = frame_skip
        self.handle_abandoned = handle_abandoned_episodes_properly
        self.value_clip_eps = value_ppo_style_clip_eps
        self.include_regularization_in_returns = (
            include_regularization_in_returns
        )
        self.huber_delta = huber_delta

    def init_params(self):
        params = {"policy_loss": self.policy_loss.init_params()}
        if self.regularizer is not None:
            params["regularizer"] = self.regularizer.init_params()
        if self.reward_normalizer is not None:
            params["popart"] = self.reward_normalizer.init_params()
        return params

    def init_norm_state(self):
        if self.reward_normalizer is None:
            return ()
        return self.reward_normalizer.init_state()

    def postprocess_params(self, params):
        out = dict(params)
        out["policy_loss"] = self.policy_loss.postprocess_params(
            params["policy_loss"]
        )
        if self.regularizer is not None:
            out["regularizer"] = self.regularizer.postprocess_params(
                params["regularizer"]
            )
        return out

    def _log_probs(self, learner_logits, agent_outputs):
        target = self.dist.log_prob(learner_logits, agent_outputs.action)
        behaviour = self.dist.log_prob(
            agent_outputs.policy_logits, agent_outputs.action
        )
        return target, behaviour

    def compute_advantages(
        self,
        net_params,
        loss_params,
        norm_state,
        agent_state,
        prev_actions,
        env_outputs,
        agent_outputs,
        rng=None,
        update_stats: bool = True,
        return_learner_outputs: bool = False,
    ):
        """Returns (targets, advantages[, learner_outputs], new_norm_state,
        new_loss_params, logs); inputs are [T+1, B] time-major."""
        rewards = env_outputs.reward[1:]
        done = env_outputs.done[1:]
        abandoned = env_outputs.abandoned[1:]
        if self.max_abs_reward is not None:
            rewards = jnp.clip(
                rewards, -self.max_abs_reward, self.max_abs_reward
            )
        rewards = rewards * self.reward_scaling

        (learner_logits, learner_v), _ = self.agent.unroll(
            net_params, prev_actions, env_outputs, agent_state
        )
        agent_outputs_c = jax.tree.map(lambda t: t[:-1], agent_outputs)
        learner_logits_c = learner_logits[:-1]

        target_logp, behaviour_logp = self._log_probs(
            learner_logits_c, agent_outputs_c
        )

        if self.reward_normalizer is not None:
            corrected = self.reward_normalizer.correct_prediction(
                loss_params["popart"], learner_v
            )
            unnormalized = self.reward_normalizer.unnormalize_prediction(
                norm_state, corrected
            )
        else:
            unnormalized = learner_v

        if not self.handle_abandoned:
            abandoned = jnp.zeros_like(abandoned)
        done_terminated = jnp.logical_and(done, ~abandoned)
        done_abandoned = jnp.logical_and(done, abandoned)

        if self.include_regularization_in_returns and self.regularizer:
            additional_rewards, _, _ = self.regularizer(
                loss_params["regularizer"],
                self.dist,
                learner_logits_c,
                agent_outputs_c.policy_logits,
                agent_outputs_c.action,
                rng=rng,
            )
            rewards = rewards + additional_rewards

        adjusted_discount = self.discount_factor**self.frame_skip

        vs, advantages = self.advantage_estimator(
            unnormalized,
            rewards,
            done_terminated,
            done_abandoned,
            adjusted_discount,
            target_logp,
            behaviour_logp,
        )

        logs = {}
        new_loss_params = loss_params
        if self.reward_normalizer is not None:
            targets = self.reward_normalizer.normalize_target(norm_state, vs)
            advantages = self.reward_normalizer.normalize_advantage(
                norm_state, advantages
            )
            if update_stats:
                norm_state, new_popart, pop_logs = (
                    self.reward_normalizer.update_statistics(
                        norm_state, loss_params["popart"], vs
                    )
                )
                new_loss_params = dict(loss_params, popart=new_popart)
                logs.update(pop_logs)
        else:
            targets = vs

        out = (targets, advantages)
        if return_learner_outputs:
            out += ((learner_logits, learner_v),)
        return out + (norm_state, new_loss_params, logs)

    def __call__(
        self,
        net_params,
        loss_params,
        norm_state,
        agent_state,
        prev_actions,
        env_outputs,
        agent_outputs,
        rng=None,
        normalized_targets=None,
        normalized_advantages=None,
    ) -> Tuple[jnp.ndarray, LossAux]:
        logs = {}
        if normalized_targets is None:
            (
                normalized_targets,
                normalized_advantages,
                (learner_logits_full, learner_v_full),
                norm_state,
                loss_params,
                adv_logs,
            ) = self.compute_advantages(
                net_params,
                loss_params,
                norm_state,
                agent_state,
                prev_actions,
                env_outputs,
                agent_outputs,
                rng=rng,
                update_stats=True,
                return_learner_outputs=True,
            )
            logs.update(adv_logs)
            # Last timestep was only for bootstrapping.
            prev_actions, env_outputs, agent_outputs = jax.tree.map(
                lambda t: t[:-1], (prev_actions, env_outputs, agent_outputs)
            )
            learner_logits = learner_logits_full[:-1]
            learner_v = learner_v_full[:-1]
        else:
            (learner_logits, learner_v), _ = self.agent.unroll(
                net_params, prev_actions, env_outputs, agent_state
            )

        target_logp, behaviour_logp = self._log_probs(
            learner_logits, agent_outputs
        )

        if self.reward_normalizer is not None:
            corrected = self.reward_normalizer.correct_prediction(
                loss_params["popart"], learner_v
            )
            old_corrected = self.reward_normalizer.correct_prediction(
                loss_params["popart"], agent_outputs.baseline
            )
        else:
            corrected = learner_v
            old_corrected = agent_outputs.baseline

        policy_loss, pl_logs = self.policy_loss(
            loss_params["policy_loss"],
            normalized_advantages,
            target_logp,
            behaviour_logp,
            actions=agent_outputs.action,
            target_logits=learner_logits,
            behaviour_logits=agent_outputs.policy_logits,
            parametric_action_distribution=self.dist,
        )
        logs.update(pl_logs)

        v_error = normalized_targets - corrected
        logs["GeneralizedOnPolicyLoss/V_error"] = jnp.mean(v_error)
        logs["GeneralizedOnPolicyLoss/abs_V_error"] = jnp.mean(
            jnp.abs(v_error)
        )
        if self.huber_delta is not None:
            v_loss = _huber(v_error, self.huber_delta)
        else:
            v_loss = jnp.square(v_error)
        if self.value_clip_eps is not None:
            clipped_pred = jnp.clip(
                corrected,
                old_corrected - self.value_clip_eps,
                old_corrected + self.value_clip_eps,
            )
            clipped_err = normalized_targets - clipped_pred
            clipped_v_loss = (
                _huber(clipped_err, self.huber_delta)
                if self.huber_delta is not None
                else jnp.square(clipped_err)
            )
            v_loss = jnp.maximum(v_loss, clipped_v_loss)
        v_loss = jnp.mean(v_loss)
        logs["GeneralizedOnPolicyLoss/v_loss"] = v_loss

        if self.regularizer is not None:
            per_step_reg, reg_loss, reg_logs = self.regularizer(
                loss_params["regularizer"],
                self.dist,
                learner_logits,
                agent_outputs.policy_logits,
                agent_outputs.action,
                rng=rng,
            )
            if not self.include_regularization_in_returns:
                reg_loss = reg_loss + jnp.mean(per_step_reg)
            logs.update(reg_logs)
        else:
            reg_loss = 0.0

        total_loss = policy_loss + self.baseline_cost * v_loss + reg_loss
        logs["GeneralizedOnPolicyLoss/policy_loss"] = policy_loss
        logs["GeneralizedOnPolicyLoss/total_loss"] = total_loss
        return total_loss, LossAux(
            logs=logs, norm_state=norm_state, loss_params=loss_params
        )
