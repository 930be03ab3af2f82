"""Observation normalization with trainable compensation.

Parity with /root/reference/agents/policy_gradient/modules/
input_normalization.py: inputs are normalized by tracked mean/std; trainable
compensation (a, b) applies after normalization (and clipping) so that when
the statistics move from (m, s) to (m', s'), reassigning a' = s'/s * a and
b' = b + a/s * (m' - m) keeps (x-m)/s * a + b invariant — statistics updates
never change the policy/value function.
"""

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from seed_rl_tpu.ops.running_statistics import MeanStd


class InputNormalization:
    def __init__(self, mean_std_tracker: MeanStd, input_size: int):
        self.tracker = mean_std_tracker
        self.input_size = input_size

    def init_state(self):
        return self.tracker.init_state(self.input_size)

    def init_params(self) -> Dict[str, jnp.ndarray]:
        return {
            "compensation_mean": jnp.zeros((self.input_size,), jnp.float32),
            "compensation_std": jnp.ones((self.input_size,), jnp.float32),
        }

    def normalize(self, state, x):
        return self.tracker.normalize(state, x)

    def correct(self, params, x):
        return params["compensation_std"] * x + params["compensation_mean"]

    def update_statistics(
        self, state, params, data
    ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
        mean1, std1 = self.tracker.mean_std(state)
        new_state = self.tracker.update(state, data)
        mean2, std2 = self.tracker.mean_std(new_state)
        new_params = {
            "compensation_std": std2 / std1 * params["compensation_std"],
            "compensation_mean": params["compensation_mean"]
            + params["compensation_std"] / std1 * (mean2 - mean1),
        }
        return new_state, new_params

    def mean_std(self, state):
        return self.tracker.mean_std(state)
