"""Agent = network + parametric action distribution, as pure functions.

Preserves the reference's agent call contract (SURVEY.md §2.3;
agents/vtrace/networks.py:74-121): step-mode application on ``[B]`` inputs
returning ``AgentOutput(action, policy_logits, baseline)`` plus new core
state, and unroll-mode application on time-major ``[T, B]`` inputs. Unlike
the reference, sampling takes an explicit PRNG key and training unrolls skip
sampling entirely (the stored behaviour actions are what losses need).

For stateless networks the unroll folds time into batch (reference
``batch_apply``, common/utils.py:714-732) so the whole unroll is one batched
matmul stack on the MXU instead of a sequential scan.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from seed_rl_tpu.distributions import ParametricDistribution
from seed_rl_tpu.types import AgentOutput, EnvOutput


def batch_apply(fn, inputs):
    """Fold leading [T, B] dims into one batch dim, apply, unfold."""
    leaves = jax.tree.leaves(inputs)
    t, b = leaves[0].shape[:2]
    folded = jax.tree.map(
        lambda x: x.reshape((t * b,) + x.shape[2:]), inputs
    )
    out = fn(folded)
    return jax.tree.map(lambda x: x.reshape((t, b) + x.shape[1:]), out)


class PolicyAgent:
    """Policy-gradient-family agent (V-trace, PPO, SAC actor)."""

    def __init__(self, net, distribution: ParametricDistribution):
        self.net = net
        self.distribution = distribution

    def init_params(self, rng, prev_action, env_output: EnvOutput):
        """Initialize network params from example batch-major inputs."""
        batch = jax.tree.leaves(env_output.observation)[0].shape[0]
        core_state = self.net.initial_state(batch)
        return self.net.init(rng, prev_action, env_output, core_state)

    def initial_state(self, batch_size: int):
        return self.net.initial_state(batch_size)

    def policy_step(
        self,
        params,
        prev_action,
        env_output: EnvOutput,
        core_state,
        rng,
        deterministic: bool = False,
    ) -> Tuple[AgentOutput, Any]:
        """One inference step on [B] inputs; samples an action."""
        (policy_params, baseline), core_state = self.net.apply(
            params, prev_action, env_output, core_state
        )
        if deterministic:
            action = self.distribution.mode(policy_params)
        else:
            action = self.distribution.sample(policy_params, rng)
        return AgentOutput(action, policy_params, baseline), core_state

    def unroll(
        self, params, prev_actions, env_outputs: EnvOutput, core_state
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Any]:
        """Training forward over time-major [T, B] inputs (no sampling)."""
        if getattr(self.net, "stateless", False):
            out = batch_apply(
                lambda args: self.net.apply(params, args[0], args[1], ())[0],
                (prev_actions, env_outputs),
            )
            return out, core_state

        if hasattr(self.net, "unroll_time_major"):
            # TPU fast path: torso/heads folded over T*B (one big MXU
            # batch), only the recurrent core scanned over time.
            return self.net.apply(
                params, prev_actions, env_outputs, core_state,
                method=self.net.unroll_time_major,
            )

        def step(state, xs):
            prev_action, env_output = xs
            out, state = self.net.apply(
                params, prev_action, env_output, state
            )
            return state, out

        core_state, outs = jax.lax.scan(
            step, core_state, (prev_actions, env_outputs)
        )
        return outs, core_state

    def __call__(
        self,
        params,
        prev_actions,
        env_outputs,
        core_state,
        unroll: bool = False,
        rng: Optional[jnp.ndarray] = None,
        is_training: bool = False,
    ):
        """Reference-compatible entry point (SURVEY.md §2.3)."""
        if unroll:
            return self.unroll(params, prev_actions, env_outputs, core_state)
        assert rng is not None, "step-mode inference needs a PRNG key"
        return self.policy_step(
            params, prev_actions, env_outputs, core_state, rng
        )


class NormalizingObservationsAgent:
    """Observation-normalizing wrapper around a ``PolicyAgent``.

    Capability parity with the reference's ``NormalizeObservationsWrapper``
    (common/normalizer.py:155-211) as used by the V-trace learner
    (agents/vtrace/learner.py:277-278): observations are normalized by
    streaming mean/std statistics before the policy network sees them, and
    the statistics are folded in once per training step
    (``update_observation_normalization`` == the reference's
    ``end_of_training_step_callback``).

    The wrapped agent's parameter tree is ``{"policy": inner_params,
    "obs_norm": NormalizerState}`` — learners treat it opaquely.
    """

    def __init__(self, inner: PolicyAgent, eps: float = 0.001,
                 clip_range=(-5.0, 5.0)):
        from seed_rl_tpu.ops import normalizer as obs_normalizer

        self._norm = obs_normalizer
        self.inner = inner
        self.distribution = inner.distribution
        self.eps = eps
        self.clip_range = clip_range

    def init_params(self, rng, prev_action, env_output: EnvOutput):
        width = sum(
            int(leaf.shape[-1])
            for leaf in jax.tree.leaves(env_output.observation)
        )
        return {
            "policy": self.inner.init_params(rng, prev_action, env_output),
            "obs_norm": self._norm.init(width),
        }

    def initial_state(self, batch_size: int):
        return self.inner.initial_state(batch_size)

    def _normalized(self, params, env_outputs: EnvOutput) -> EnvOutput:
        observation = self._norm.normalize_observation(
            params["obs_norm"], env_outputs.observation, self.eps,
            self.clip_range,
        )
        return env_outputs._replace(observation=observation)

    def policy_step(self, params, prev_action, env_output, core_state, rng,
                    deterministic: bool = False):
        return self.inner.policy_step(
            params["policy"], prev_action,
            self._normalized(params, env_output), core_state, rng,
            deterministic,
        )

    def unroll(self, params, prev_actions, env_outputs, core_state):
        return self.inner.unroll(
            params["policy"], prev_actions,
            self._normalized(params, env_outputs), core_state,
        )

    def update_observation_normalization(self, params, observation,
                                         axis_name=None):
        """End-of-training-step statistics fold (normalizer.py:197-198)."""
        return dict(
            params,
            obs_norm=self._norm.update_from_observation(
                params["obs_norm"], observation, axis_name
            ),
        )
