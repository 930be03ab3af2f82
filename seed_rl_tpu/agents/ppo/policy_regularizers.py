"""KL/entropy policy regularizers with per-term adaptive coefficients.

Parity with /root/reference/agents/policy_gradient/modules/
policy_regularizers.py: terms ``kl_pi_mu`` (KL(pi||mu)), ``kl_mu_pi``
(KL(mu||pi)), ``entropy`` (negative entropy enters the loss, so an entropy
*constraint* means -entropy <= threshold) and ``kl_ref_pi`` (KL from the
zero-parameter reference distribution to pi). Each coefficient can be fixed
or a Lagrange constraint; returns (per-step loss [T, B], scalar adjustment
loss, logs).
"""

from typing import Dict, Optional

import jax.numpy as jnp

from seed_rl_tpu.agents.ppo import constraints

_VALID = ("kl_pi_mu", "kl_mu_pi", "entropy", "kl_ref_pi")


class KLPolicyRegularizer:
    def __init__(self, entropy_key: Optional[jnp.ndarray] = None, **coefficients):
        for key in coefficients:
            assert key in _VALID, key
        self.coefficients = {
            k: constraints.as_coefficient(v) for k, v in coefficients.items()
        }

    def init_params(self):
        return {k: c.init_params() for k, c in self.coefficients.items()}

    def postprocess_params(self, params):
        return {
            k: self.coefficients[k].postprocess_params(p)
            for k, p in params.items()
        }

    def __call__(
        self,
        params,
        parametric_action_distribution,
        pi_logits,
        mu_logits,
        actions,
        rng=None,
    ):
        dist = parametric_action_distribution
        # All four terms are computed (cheap) for logging parity with the
        # reference, which logs them regardless of active coefficients.
        losses = {}
        losses["kl_pi_mu"] = dist.kl_divergence(pi_logits, mu_logits)
        losses["kl_mu_pi"] = dist.kl_divergence(mu_logits, pi_logits)
        losses["kl_ref_pi"] = dist.kl_divergence(
            jnp.zeros_like(pi_logits), pi_logits
        )
        losses["entropy"] = -(
            dist.entropy(pi_logits, rng)
            if dist.reparametrizable
            else dist.entropy(pi_logits)
        )

        logs = {
            f"KLPolicyRegularizer/{k}": jnp.mean(
                v * (-1.0 if k == "entropy" else 1.0)
            )
            for k, v in losses.items()
        }

        per_step_loss = jnp.zeros(pi_logits.shape[:-1], jnp.float32)
        global_loss = jnp.zeros((), jnp.float32)
        for key, coe in self.coefficients.items():
            loss = losses[key]
            logs[f"KLPolicyRegularizer/{key}/coefficient"] = coe.value(
                params[key]
            )
            per_step_loss = per_step_loss + coe.scale_loss(params[key], loss)
            global_loss = global_loss + coe.adjustment_loss(
                params[key], jnp.mean(loss)
            )
        logs["KLPolicyRegularizer/per_step_loss"] = jnp.mean(per_step_loss)
        logs["KLPolicyRegularizer/global_loss"] = global_loss
        return per_step_loss, global_loss, logs
