"""PopArt reward/return normalization (compensation-variable variant).

Parity with /root/reference/agents/policy_gradient/modules/popart.py: value
targets are normalized by tracked mean/std; *trainable* compensation
variables (a, b) define an affine output correction, and whenever the
statistics move from (m, s) to (m', s') the compensations are reassigned so
that s*(x*a + b) + m == s'*(x*a' + b') + m' — statistics updates never change
the implicit value prediction.

Functional split: the tracker state is non-trained (updated by
``update_statistics``); the compensation pair lives in the *params* tree so
the optimizer trains it, and ``update_statistics`` additionally returns the
compensation reassignment.
"""

from typing import Any, Dict, NamedTuple, Tuple

import jax.numpy as jnp

from seed_rl_tpu.ops.running_statistics import MeanStd


class PopArt:
    def __init__(self, mean_std_tracker: MeanStd, compensate: bool = True):
        self.tracker = mean_std_tracker
        self.compensate = compensate

    def init_state(self):
        return self.tracker.init_state(1)

    def init_params(self) -> Dict[str, jnp.ndarray]:
        if not self.compensate:
            return {}
        return {
            "compensation_mean": jnp.zeros((), jnp.float32),
            "compensation_std": jnp.ones((), jnp.float32),
        }

    def normalize_target(self, state, x):
        return jnp.squeeze(
            self.tracker.normalize(state, x[..., None]), -1
        )

    def normalize_advantage(self, state, x):
        _, std = self.tracker.mean_std(state)
        return x / std

    def correct_prediction(self, params, x):
        if not self.compensate:
            return x
        return params["compensation_std"] * x + params["compensation_mean"]

    def unnormalize_prediction(self, state, x):
        return jnp.squeeze(
            self.tracker.unnormalize(state, x[..., None]), -1
        )

    def update_statistics(
        self, state, params, data
    ) -> Tuple[Any, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Returns (new_state, new_params, logs). ``data``: f32[T, B]."""
        mean1, std1 = self.tracker.mean_std(state)
        new_state = self.tracker.update(state, data[..., None])
        mean2, std2 = self.tracker.mean_std(new_state)
        logs = {
            "PopArt/mean": jnp.squeeze(mean2, -1),
            "PopArt/std": jnp.squeeze(std2, -1),
        }
        if not self.compensate:
            return new_state, params, logs
        new_std = jnp.squeeze(std1 / std2, -1) * params["compensation_std"]
        new_mean = jnp.squeeze(
            (mean1 - mean2 + std1 * params["compensation_mean"]) / std2, -1
        )
        return (
            new_state,
            {"compensation_mean": new_mean, "compensation_std": new_std},
            logs,
        )
