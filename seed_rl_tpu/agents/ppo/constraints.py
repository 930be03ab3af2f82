"""Loss coefficients: fixed or Lagrange-adaptive.

Parity with /root/reference/agents/policy_gradient/modules/constraints.py:
``FixedCoefficient`` and ``LagrangeInequalityCoefficient`` (exp-transformed
parameter, clipped range, ``adjustment_loss`` implementing the soft
inequality f(x) + sg(c)*x + c*sg(threshold - x)).

Functional split: ``init_params()`` returns the trainable parameter pytree
({} for fixed); all other methods are pure functions of it.
``postprocess_params`` applies the reference's clip-constraint after each
optimizer step.
"""

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


class Coefficient:
    def init_params(self) -> Dict[str, Any]:
        return {}

    def value(self, params):
        raise NotImplementedError

    def adjustment_loss(self, params, reference_value):
        return jnp.zeros((), jnp.float32)

    def scale_loss(self, params, unscaled_loss):
        return jax.lax.stop_gradient(self.value(params)) * unscaled_loss

    def postprocess_params(self, params):
        return params


class FixedCoefficient(Coefficient):
    def __init__(self, value: float):
        self._value = value

    def value(self, params):
        return jnp.asarray(self._value, jnp.float32)


class LagrangeInequalityCoefficient(Coefficient):
    """Soft inequality x <= threshold via an adaptive multiplier.

    Minimizing f(x) + sg(alpha)*x + alpha*sg(threshold - x) makes alpha grow
    while x > threshold (pushing x down) and shrink otherwise.
    """

    def __init__(
        self,
        threshold: float,
        init_alpha: float = 1.0,
        alpha_range=(1e-6, 1e6),
        adjustment_speed: float = 1.0,
    ):
        assert alpha_range[0] >= 0
        self.threshold = threshold
        self.init_alpha = init_alpha
        self.alpha_range = alpha_range
        self.adjustment_speed = adjustment_speed

    def init_params(self):
        return {
            "param": jnp.asarray(
                math.log(self.init_alpha) / self.adjustment_speed, jnp.float32
            )
        }

    def value(self, params):
        return jnp.exp(self.adjustment_speed * params["param"])

    def adjustment_loss(self, params, reference_value):
        return self.value(params) * jax.lax.stop_gradient(
            self.threshold - jnp.mean(reference_value)
        )

    def postprocess_params(self, params):
        lo = math.log(self.alpha_range[0]) / self.adjustment_speed
        hi = math.log(self.alpha_range[1]) / self.adjustment_speed
        return {"param": jnp.clip(params["param"], lo, hi)}


def as_coefficient(value) -> Coefficient:
    if isinstance(value, Coefficient):
        return value
    return FixedCoefficient(float(value))
