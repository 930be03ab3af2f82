"""Advantage-based policy losses: PG / V-trace-IS / PPO / AWR / V-MPO.

Parity with /root/reference/agents/policy_gradient/modules/policy_losses.py:
- ``AdvantagePreprocessor`` (:25-67): normalize / top-half / positive-only /
  offset, returning (processed, mask).
- ``GeneralizedAdvantagePolicyLoss`` (:70-183): one loss covering PG
  (plain -logp*adv), V-trace (IS weights), PPO (the epsilon-mask formulation,
  which yields the same gradient as the clipped-surrogate form), AWR
  (exp-transformed advantages with temperature) and V-MPO (softmax transform,
  top-half filter, Lagrange temperature with the eq.(4) KL adjustment).
- factories ``pg/vtrace_is/ppo/awr/vmpo/bc_logp/repeat_positive_advantages``
  (:187-247).

Trainable pieces (the V-MPO temperature) follow the Coefficient convention:
``init_params()`` + pure methods.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from seed_rl_tpu.agents.ppo import constraints


class AdvantagePreprocessor:
    def __init__(
        self,
        normalize: bool = False,
        only_positive: bool = False,
        only_top_half: bool = False,
        offset: Optional[float] = None,
    ):
        self.normalize = normalize
        self.only_positive = only_positive
        self.only_top_half = only_top_half
        self.offset = offset

    def __call__(self, advantages):
        mask = jnp.ones_like(advantages)
        if self.normalize:
            advantages = advantages - jnp.mean(advantages)
            advantages = advantages / (jnp.std(advantages) + 1e-8)
        if self.only_top_half:
            flat = advantages.reshape(-1)
            k = flat.shape[0] // 2
            median = jnp.min(jax.lax.top_k(flat, k)[0])
            mask = mask * (advantages >= median).astype(jnp.float32)
        if self.only_positive:
            mask = mask * (advantages > 0.0).astype(jnp.float32)
        if self.offset is not None:
            advantages = advantages + self.offset
        return mask * advantages, mask


def softmax_all_dims(t):
    flat = t.reshape(-1)
    return jax.nn.softmax(flat).reshape(t.shape)


class GeneralizedAdvantagePolicyLoss:
    """Returns (scalar loss, logs); trainable temperature via init_params."""

    def __init__(
        self,
        advantage_preprocessor: Optional[AdvantagePreprocessor] = None,
        use_importance_weights: bool = False,
        max_importance_weight: Optional[float] = None,
        ppo_epsilon: Optional[float] = None,
        max_advantage: Optional[float] = None,
        advantage_transformation: Optional[Callable] = None,
        temperature: Optional[constraints.Coefficient] = None,
    ):
        self.advantage_preprocessor = (
            advantage_preprocessor or AdvantagePreprocessor()
        )
        self.use_importance_weights = use_importance_weights
        self.max_importance_weight = max_importance_weight
        self.ppo_epsilon = ppo_epsilon
        self.max_advantage = max_advantage
        self.advantage_transformation = advantage_transformation
        self.temperature = temperature

    def init_params(self):
        if self.temperature is None:
            return {}
        return {"temperature": self.temperature.init_params()}

    def postprocess_params(self, params):
        if self.temperature is None:
            return params
        return {
            "temperature": self.temperature.postprocess_params(
                params["temperature"]
            )
        }

    def __call__(
        self,
        params,
        advantages,
        target_action_log_probs,
        behaviour_action_log_probs,
        actions=None,
        target_logits=None,
        behaviour_logits=None,
        parametric_action_distribution=None,
    ):
        logs = {
            "GeneralizedAdvantagePolicyLoss/advantages": jnp.mean(advantages),
            "GeneralizedAdvantagePolicyLoss/abs_advantages": jnp.mean(
                jnp.abs(advantages)
            ),
            "GeneralizedAdvantagePolicyLoss/log_pi": jnp.mean(
                target_action_log_probs
            ),
            "GeneralizedAdvantagePolicyLoss/log_mu": jnp.mean(
                behaviour_action_log_probs
            ),
        }
        advantages, mask = self.advantage_preprocessor(advantages)

        advantages_before_transformation = None
        if self.advantage_transformation is not None:
            assert self.temperature is not None
            temp = self.temperature.value(params["temperature"])
            logs["GeneralizedAdvantagePolicyLoss/temperature"] = temp
            advantages = advantages / jax.lax.stop_gradient(temp)
            if self.max_advantage is not None:
                advantages = jnp.minimum(advantages, self.max_advantage)
            advantages_before_transformation = advantages
            advantages = mask * self.advantage_transformation(advantages)
        else:
            if self.max_advantage is not None:
                advantages = jnp.minimum(advantages, self.max_advantage)
            advantages = advantages * mask

        logs["GeneralizedAdvantagePolicyLoss/processed_advantages"] = jnp.mean(
            advantages
        )

        # PG loss.
        loss = -target_action_log_probs * jax.lax.stop_gradient(advantages)

        # Importance sampling weights.
        log_rho = jax.lax.stop_gradient(
            target_action_log_probs - behaviour_action_log_probs
        )
        if self.ppo_epsilon is not None:
            # Mask formulation of PPO clipping: where the surrogate would be
            # clipped AND moving further would improve it, the gradient is
            # zero — identical gradients to the min(clip) form.
            log_bound = math.log(1.0 + self.ppo_epsilon)
            clip_pos = (advantages > 0) & (log_rho > log_bound)
            clip_neg = (advantages < 0) & (log_rho < -log_bound)
            loss_mask = (~(clip_pos | clip_neg)).astype(jnp.float32)
            loss = loss * loss_mask
            log_rho = log_rho * loss_mask  # avoid overflow in exp
            logs["GeneralizedAdvantagePolicyLoss/p_ppo_clipped"] = 1 - jnp.mean(
                loss_mask
            )
        if self.max_importance_weight is not None:
            log_rho = jnp.minimum(
                log_rho, math.log(self.max_importance_weight)
            )
        logs["GeneralizedAdvantagePolicyLoss/log_rho"] = jnp.mean(log_rho)
        if self.use_importance_weights:
            loss = loss * jnp.exp(log_rho)

        loss = jnp.mean(loss)

        if self.advantage_transformation is not None:
            # Temperature adjustment: KL between the nonparametric target
            # distribution and the behaviour one (V-MPO eq. 4).
            adv = advantages_before_transformation * mask
            adv = adv - (1.0 - mask) * 1e3  # -> 0 after exp
            kl = jax.scipy.special.logsumexp(adv) - jnp.log(
                jnp.sum(mask) + 1e-3
            )
            logs["GeneralizedAdvantagePolicyLoss/mpo_kl"] = kl
            loss = loss + self.temperature.adjustment_loss(
                params["temperature"], kl
            )

        return loss, logs


def pg():
    return GeneralizedAdvantagePolicyLoss()


def vtrace_is(max_importance_weight=1.0):
    return GeneralizedAdvantagePolicyLoss(
        use_importance_weights=True,
        max_importance_weight=max_importance_weight,
    )


def ppo(epsilon, normalize_advantages=False, advantage_offset=None):
    return GeneralizedAdvantagePolicyLoss(
        use_importance_weights=True,
        ppo_epsilon=epsilon,
        advantage_preprocessor=AdvantagePreprocessor(
            normalize=normalize_advantages, offset=advantage_offset
        ),
    )


def awr(beta, w_max):
    return GeneralizedAdvantagePolicyLoss(
        advantage_transformation=jnp.exp,
        temperature=constraints.FixedCoefficient(beta),
        max_advantage=math.log(w_max),
    )


def bc_logp():
    return GeneralizedAdvantagePolicyLoss(
        advantage_transformation=jnp.ones_like,
        temperature=constraints.FixedCoefficient(1.0),
    )


def vmpo(e_n):
    """Top-half V-MPO loss; add a KL(mu||pi) regularizer for full V-MPO."""
    return GeneralizedAdvantagePolicyLoss(
        advantage_transformation=softmax_all_dims,
        advantage_preprocessor=AdvantagePreprocessor(only_top_half=True),
        temperature=constraints.LagrangeInequalityCoefficient(
            threshold=e_n, adjustment_speed=10.0
        ),
    )


def repeat_positive_advantages():
    """Supervised learning on positive-advantage actions (AWR/V-MPO limit)."""
    return awr(beta=1e-6, w_max=1.0)
