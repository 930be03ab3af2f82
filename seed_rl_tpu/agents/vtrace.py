"""V-trace (IMPALA) agent: on-device rollout + training in one jitted step.

Loss semantics match /root/reference/agents/vtrace/learner.py:73-159 exactly:
policy gradient on V-trace advantages, 0.5-weighted baseline MSE, entropy
bonus with an optionally auto-tuned Lagrange entropy cost
(cost = exp(speed * param), param clipped to ±20/speed — learner.py:225-234),
and a KL(behaviour‖target) penalty. The reference's queue/dataset/strategy
plumbing (learner.py:314-476) collapses into: rollout scan → loss → psum'd
grads → optax update, all inside one ``jit``.

The data-parallel story is §7 of SURVEY.md: vmap over envs inside a device,
``shard_map``/pjit over a mesh across devices (see seed_rl_tpu.parallel).

Abandoned episodes (time-limit truncation): like the reference's practical
behavior on gym envs, truncation folds into ``done`` and is treated as
termination (zero bootstrap). The reference instead ASSERTS abandoned
never reaches V-trace (learner.py:368-370) because only envs that report
``info['abandoned']`` engage its special protocol and only PPO consumes
it; here every adapter reports truncation, so the permissive fold (with
identical math on such steps) replaces the crash. Truncation-aware
bootstrapping lives in the PPO loss family (ops/advantages.py).
"""

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.distributions import ParametricDistribution
# Fused Pallas V-trace on TPU with lane-aligned batches; numerically
# identical lax.scan fallback elsewhere (tests/test_pallas_vtrace.py).
from seed_rl_tpu.ops.pallas import vtrace_kernel as vtrace_ops
from seed_rl_tpu.rollout import RolloutEngine, RolloutState, Unroll
from seed_rl_tpu.utils import episode_stats


@dataclasses.dataclass(frozen=True)
class VTraceConfig:
    """Loss & schedule knobs (defaults = reference flag defaults)."""

    discounting: float = 0.99
    lambda_: float = 1.0
    entropy_cost: float = 0.00025
    target_entropy: Optional[float] = None
    entropy_cost_adjustment_speed: float = 10.0
    baseline_cost: float = 0.5
    kl_cost: float = 0.0
    max_abs_reward: float = 0.0
    num_action_repeats: int = 1


class VTraceTrainState(NamedTuple):
    params: Any  # {"net": network params, "entropy_cost": f32 scalar}
    opt_state: Any
    rollout: RolloutState
    stats: episode_stats.EpisodeStatsState
    step: jnp.ndarray  # i32[] training iterations
    # Cumulative env frames = step * frames_per_step, tracked on host to
    # avoid on-device int32 overflow at multi-billion-frame budgets.


def entropy_cost_value(config: VTraceConfig, param: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(config.entropy_cost_adjustment_speed * param)


def compute_loss(
    config: VTraceConfig,
    agent: PolicyAgent,
    dist: ParametricDistribution,
    params: Any,
    unroll: Unroll,
    rng: jnp.ndarray,
) -> Tuple[jnp.ndarray, dict]:
    ts = unroll.timesteps
    (policy_params, baseline), _ = agent.unroll(
        params["net"], ts.prev_action, ts.env_output, unroll.agent_state
    )

    # Last step is bootstrap-only.
    bootstrap_value = baseline[-1]
    behaviour_logits = ts.agent_output.policy_logits[:-1]
    actions = ts.agent_output.action[:-1]
    rewards = ts.env_output.reward[1:]
    done = ts.env_output.done[1:]
    learner_logits = policy_params[:-1]
    values = baseline[:-1]

    if config.max_abs_reward:
        rewards = jnp.clip(
            rewards, -config.max_abs_reward, config.max_abs_reward
        )
    discounts = (~done).astype(jnp.float32) * config.discounting

    target_logp = dist.log_prob(learner_logits, actions)
    behaviour_logp = dist.log_prob(behaviour_logits, actions)

    returns = vtrace_ops.from_importance_weights(
        target_action_log_probs=target_logp,
        behaviour_action_log_probs=behaviour_logp,
        discounts=discounts,
        rewards=rewards,
        values=values,
        bootstrap_value=bootstrap_value,
        lambda_=config.lambda_,
    )

    policy_loss = -jnp.mean(
        target_logp * jax.lax.stop_gradient(returns.pg_advantages)
    )
    v_error = returns.vs - values
    v_loss = config.baseline_cost * 0.5 * jnp.mean(jnp.square(v_error))

    entropy = jnp.mean(
        dist.entropy(learner_logits, rng)
        if dist.reparametrizable
        else dist.entropy(learner_logits)
    )
    entropy_cost = entropy_cost_value(config, params["entropy_cost"])
    entropy_loss = jax.lax.stop_gradient(entropy_cost) * -entropy

    kl = behaviour_logp - target_logp
    kl_loss = config.kl_cost * jnp.mean(kl)

    if config.target_entropy is not None:
        entropy_adjustment_loss = entropy_cost * jax.lax.stop_gradient(
            entropy - config.target_entropy
        )
    else:
        entropy_adjustment_loss = 0.0 * entropy_cost

    total_loss = (
        policy_loss + v_loss + entropy_loss + kl_loss + entropy_adjustment_loss
    )
    metrics = {
        "V/value_function": jnp.mean(values),
        "V/L2_error": jnp.sqrt(jnp.mean(jnp.square(v_error))),
        "losses/policy": policy_loss,
        "losses/V": v_loss,
        "losses/entropy": entropy_loss,
        "losses/kl": kl_loss,
        "losses/total": total_loss,
        "policy/entropy": entropy,
        "policy/entropy_cost": entropy_cost,
        "policy/kl(old|new)": jnp.mean(kl),
    }
    return total_loss, metrics


class VTraceLearner:
    """On-policy IMPALA learner with fused rollout+train steps.

    ``axis_name``: if set, gradients and episode stats are psum-averaged over
    that mesh axis (used by parallel.learner_on_mesh).
    """

    def __init__(
        self,
        engine: RolloutEngine,
        agent: PolicyAgent,
        config: VTraceConfig,
        optimizer: optax.GradientTransformation,
        axis_name: Optional[str] = None,
    ):
        assert engine.overlap == 0, "V-trace uses 1-step boundary overlap only"
        self.engine = engine
        self.agent = agent
        self.config = config
        self.optimizer = optimizer
        self.axis_name = axis_name
        self._frames_per_step = (
            engine.unroll_length
            * engine.env.num_envs
            * config.num_action_repeats
        )

    @property
    def frames_per_step(self):
        return self._frames_per_step

    def init(self, rng) -> VTraceTrainState:
        mul = self.config.entropy_cost_adjustment_speed
        init_rng, rollout_rng, env_rng = jax.random.split(rng, 3)
        if self.engine.is_host:
            env_output = jax.tree.map(
                jnp.asarray, self.engine.env.reset(seed=0)
            )
        else:
            _, env_output = self.engine.env.reset(env_rng)
        prev_action = self.engine._batch_zero_action(self.engine.env.num_envs)
        net_params = self.agent.init_params(init_rng, prev_action, env_output)
        params = {
            "net": net_params,
            "entropy_cost": jnp.asarray(
                jnp.log(self.config.entropy_cost) / mul, jnp.float32
            ),
        }
        return VTraceTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            # Host engines keep rollout state outside the jax train state.
            rollout=()
            if self.engine.is_host
            else self.engine.init(net_params, rollout_rng),
            stats=episode_stats.init(self.engine.env.num_envs),
            step=jnp.zeros((), jnp.int32),
        )

    def rollout_params(self, state: VTraceTrainState):
        """Parameters to run rollouts with (host-engine drivers use this)."""
        return state.params["net"]

    def update(
        self, state: VTraceTrainState, unroll: Unroll, rng
    ) -> Tuple[VTraceTrainState, dict]:
        """One optimization step on a collected unroll (engine-agnostic)."""
        grad_fn = jax.grad(
            functools.partial(
                compute_loss, self.config, self.agent, self.agent.distribution
            ),
            has_aux=True,
        )
        with jax.named_scope("train_loss_and_grads"):
            grads, metrics = grad_fn(state.params, unroll, rng)
        if self.axis_name is not None:
            grads = jax.lax.pmean(grads, self.axis_name)

        with jax.named_scope("train_apply_gradients"):
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
        # Reference clips the entropy-cost param to ±20/speed so its gradient
        # can't underflow (learner.py:228-231).
        mul = self.config.entropy_cost_adjustment_speed
        params["entropy_cost"] = jnp.clip(
            params["entropy_cost"], -20.0 / mul, 20.0 / mul
        )

        # Observation-normalization statistics fold, once per training step
        # (reference end_of_training_step_callback, vtrace learner.py:277-278).
        if hasattr(self.agent, "update_observation_normalization"):
            params = dict(
                params,
                net=self.agent.update_observation_normalization(
                    params["net"],
                    unroll.timesteps.env_output.observation,
                    self.axis_name,
                ),
            )

        # Episode accounting on the T new timesteps (skip the shared boundary
        # step, which the previous unroll already counted).
        new_env_outputs = jax.tree.map(
            lambda x: x[1:], unroll.timesteps.env_output
        )
        stats = episode_stats.update(state.stats, new_env_outputs)

        new_state = state._replace(
            params=params,
            opt_state=opt_state,
            stats=stats,
            step=state.step + 1,
        )
        return new_state, metrics

    def train_step(
        self, state: VTraceTrainState
    ) -> Tuple[VTraceTrainState, dict]:
        rollout_state, unroll = self.engine.rollout(
            state.params["net"], state.rollout
        )
        rng, loss_rng = jax.random.split(rollout_state.rng)
        rollout_state = rollout_state._replace(rng=rng)
        state = state._replace(rollout=rollout_state)
        return self.update(state, unroll, loss_rng)

    def train_many(
        self, state: VTraceTrainState, num_steps: int
    ) -> Tuple[VTraceTrainState, dict]:
        """Run ``num_steps`` fused steps under one jit; metrics averaged."""

        def body(carry, _):
            carry, metrics = self.train_step(carry)
            return carry, metrics

        state, metrics = jax.lax.scan(body, state, None, length=num_steps)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)


def learner_loop(
    learner: VTraceLearner,
    rng,
    total_environment_frames: int,
    logger=None,
    checkpoint=None,
    log_every_steps: int = 10,
    steps_per_call: int = 1,
) -> VTraceTrainState:
    """Python driver: jitted train_many + periodic logging/checkpointing.

    Mirrors the reference's learner main loop (learner.py:466-483): train
    until the frame budget, checkpoint on a time cadence, log windowed
    episode stats.

    Cadence note: the episode-stat window resets only when a log line
    fires, so when ``log_every_steps`` is not a multiple of
    ``steps_per_call`` the window spans a variable number of steps. The
    logged values are per-episode means (unbiased regardless of window
    span); only the effective sample count varies. Use
    ``log_every_steps % steps_per_call == 0`` for fixed-width windows.
    """
    assert log_every_steps >= steps_per_call, (
        "log_every_steps < steps_per_call would skip log lines entirely"
    )
    state = learner.init(rng)
    if checkpoint is not None:
        state = checkpoint.restore_or(state)

    if getattr(learner, "jit_compiled", False):
        step_fn = functools.partial(
            learner.train_many, num_steps=steps_per_call
        )
    else:
        step_fn = jax.jit(
            functools.partial(learner.train_many, num_steps=steps_per_call)
        )
    frames_per_step = learner.frames_per_step
    while int(state.step) * frames_per_step < total_environment_frames:
        state, metrics = step_fn(state)
        step = int(state.step)
        if logger is not None and step % log_every_steps < steps_per_call:
            stats = state.stats
            n = float(stats.num_episodes)
            if n > 0:
                metrics = dict(metrics)
                metrics["episodes/mean_return"] = (
                    float(stats.sum_return) / n
                )
                metrics["episodes/mean_length"] = (
                    float(stats.sum_length) / n
                )
                state = state._replace(
                    stats=episode_stats.reset_window(stats)
                )
            logger.log(step, metrics, frames=step * frames_per_step)
        if checkpoint is not None:
            checkpoint.maybe_save(step, state)
    if checkpoint is not None:
        checkpoint.maybe_save(int(state.step), state, force=True)
    return state
