"""R2D2: recurrent replay distributed DQN, TPU-native.

Capability parity with /root/reference/agents/r2d2/learner.py:
- per-env epsilon ladder 0.4^linspace(1, 8, num_training_envs) for training
  envs and a fixed eval epsilon for dedicated eval envs (ids >=
  num_training_envs) whose experience is never stored (:120-177, 793-803),
- burn-in: the stored unroll carries ``burn_in`` overlap steps; the loss
  re-runs the prefix to warm the recurrent state with stopped gradients
  (:333-384),
- sequence double-DQN loss on h-rescaled values with n-step Bellman targets
  and priorities eta*max|TD| + (1-eta)*mean|TD| (:258-330 via
  seed_rl_tpu.ops.value_ops),
- initial priorities computed at rollout time from the behaviour network
  only (:809-822),
- prioritized replay with importance-sampling weights, priorities updated
  after every optimization step (:883-885),
- target network hard-updated every ``update_target_every_n_step`` (:856),
- replay-ratio contract: the reference decouples insert/train rates via
  queues (insertion_batch = batch/replay_ratio, :113-117); the fused design
  expresses it as ``replay_ratio = train_batches_per_step * batch_size /
  num_training_envs`` per rollout cycle.

One fused jitted step does rollout → epsilon-greedy → insert → sample →
burn-in loss → update → priority write-back. A warmup phase (host loop)
fills the buffer to ``replay_buffer_min_size`` before training starts.
Abandoned/truncated episodes fold into ``done`` (treated as termination,
the reference's practical gym behavior; the reference asserts instead —
see the note in agents/vtrace.py).
"""

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.ops.pallas import nstep_kernel
from seed_rl_tpu.replay import PrioritizedReplay, ReplayState
from seed_rl_tpu.rollout import RolloutEngine, RolloutState
from seed_rl_tpu.types import QAgentOutput
from seed_rl_tpu.utils import episode_stats


def training_env_epsilons(num_training_envs: int) -> jnp.ndarray:
    """eps_i = 0.4 ** linspace(1, 8, n) (reference learner.py:151-158)."""
    return 0.4 ** jnp.linspace(1.0, 8.0, num_training_envs)


class R2D2Agent:
    """Epsilon-greedy wrapper around a Q-network (DuelingLSTMDQNNet)."""

    def __init__(self, net, epsilons: jnp.ndarray):
        """``epsilons``: f32[num_envs] per-env exploration rates."""
        self.net = net
        self.epsilons = epsilons
        self.num_actions = net.num_actions

    def init_params(self, rng, prev_action, env_output):
        batch = prev_action.shape[0]
        return self.net.init(
            rng, prev_action, env_output, self.net.initial_state(batch)
        )

    def initial_state(self, batch_size):
        return self.net.initial_state(batch_size)

    def policy_step(
        self, params, prev_action, env_output, core_state, rng,
        deterministic=False, env_ids=None,
    ) -> Tuple[QAgentOutput, Any]:
        """``env_ids``: optional i32[batch] of global env ids. In the fused
        rollout batch position == env id, so ``self.epsilons`` applies
        positionally; remote-actor inference batches are arbitrary env
        subsets, so the per-env epsilon ladder is gathered by id (the
        reference gathers epsilons the same way in its inference fn,
        agents/r2d2/learner.py:757-763)."""
        output, new_state = self.net.apply(
            params, prev_action, env_output, core_state
        )
        if deterministic:
            return output, new_state
        rand_rng, pick_rng = jax.random.split(rng)
        batch = output.action.shape[0]
        random_actions = jax.random.randint(
            rand_rng, (batch,), 0, self.num_actions, dtype=jnp.int32
        )
        epsilons = (
            self.epsilons if env_ids is None else self.epsilons[env_ids]
        )
        take_random = (
            jax.random.uniform(pick_rng, (batch,)) < epsilons
        )
        action = jnp.where(take_random, random_actions, output.action)
        return QAgentOutput(action, output.q_values), new_state

    def unroll(self, params, prev_actions, env_outputs, core_state):
        if hasattr(self.net, "unroll_time_major"):
            # TPU fast path: conv torso + dueling heads folded over T*B,
            # only the LSTM scanned over time.
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


@dataclasses.dataclass(frozen=True)
class R2D2Config:
    """Defaults = reference flags (agents/r2d2/learner.py:43-92)."""

    discounting: float = 0.997
    n_steps: int = 5
    burn_in: int = 40
    importance_sampling_exponent: float = 0.6
    priority_exponent: float = 0.9
    replay_buffer_size: int = 10_000  # unrolls
    replay_buffer_min_size: int = 500  # unrolls before training starts
    batch_size: int = 64
    train_batches_per_step: int = 1
    update_target_every_n_step: int = 2500
    eval_epsilon: float = 1e-3
    num_eval_envs: int = 0
    value_function_rescaling_epsilon: float = 1e-3
    num_action_repeats: int = 1
    # "nstep" (reference r2d2 learner.py:195-255) or "retrace":
    # Retrace(lambda) clipped-trace targets (ops/value_ops.py
    # retrace_loss_and_priorities) — a north-star capability beyond the
    # reference, which ships n-step only.
    target: str = "nstep"
    retrace_lambda: float = 0.95


class StoredUnroll(NamedTuple):
    """One replay item, item-major (leaves [T_total, ...] per slot)."""

    agent_state: Any  # core state at the unroll's first timestep
    prev_actions: jnp.ndarray
    env_outputs: Any
    agent_outputs: Any


class R2D2TrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    replay: ReplayState
    rollout: RolloutState
    stats: episode_stats.EpisodeStatsState
    eval_stats: episode_stats.EpisodeStatsState
    rng: jnp.ndarray
    step: jnp.ndarray


def unroll_to_items(unroll, num_training_envs: int) -> StoredUnroll:
    """Time-major [T, B] unroll -> item-major [num_training_envs, T] slice.

    Eval envs (ids >= num_training_envs) are excluded — their experience is
    never stored (reference learner.py:793-803)."""
    n = num_training_envs
    ts = unroll.timesteps

    def to_items(t):
        return jnp.swapaxes(t[:, :n], 0, 1)

    return StoredUnroll(
        agent_state=jax.tree.map(lambda t: t[:n], unroll.agent_state),
        prev_actions=jax.tree.map(to_items, ts.prev_action),
        env_outputs=jax.tree.map(to_items, ts.env_output),
        agent_outputs=jax.tree.map(to_items, ts.agent_output),
    )


def initial_priorities(config: "R2D2Config", items: StoredUnroll):
    """Behaviour-network-only initial priorities (reference :809-822)."""
    time_major = jax.tree.map(
        lambda t: jnp.swapaxes(t, 0, 1),
        (items.env_outputs, items.agent_outputs),
    )
    env_outputs, agent_outputs = time_major
    suffix = jax.tree.map(
        lambda t: t[config.burn_in:], (env_outputs, agent_outputs)
    )
    env_suffix, agent_suffix = suffix
    if config.target == "retrace":
        # ADVICE r4: insertion priorities must use the same error metric
        # the training loss updates them with, or early sampling is skewed
        # relative to post-training priorities. Behaviour-net-only, like
        # the n-step path (online q == target q == behaviour q).
        from seed_rl_tpu.ops import value_ops

        _, priorities = value_ops.retrace_loss_and_priorities(
            agent_suffix.q_values,
            agent_suffix.q_values,
            agent_suffix.action,
            agent_suffix.action,
            env_suffix.reward,
            env_suffix.done,
            gamma=config.discounting,
            lambda_=config.retrace_lambda,
            rescaling_eps=config.value_function_rescaling_epsilon,
        )
        return priorities
    _, priorities = nstep_kernel.td_loss_and_priorities_dispatch(
        agent_suffix.q_values,
        agent_suffix.q_values,
        agent_suffix.action,
        agent_suffix.action,
        env_suffix.reward,
        env_suffix.done,
        gamma=config.discounting,
        n_steps=config.n_steps,
        rescaling_eps=config.value_function_rescaling_epsilon,
    )
    return priorities


def compute_loss_and_priorities(
    agent: R2D2Agent,
    params,
    target_params,
    agent_state,
    prev_actions,
    env_outputs,
    agent_outputs,
    gamma: float,
    burn_in: int,
    n_steps: int,
    eta: float = 0.9,
    rescaling_eps: float = 1e-3,
    target: str = "nstep",
    retrace_lambda: float = 0.95,
):
    """Burn-in + double-DQN sequence loss (reference :333-384).

    ``target="retrace"`` swaps the n-step Bellman targets for
    Retrace(lambda) clipped-trace targets (value_ops.py)."""
    if burn_in:
        prefix = jax.tree.map(
            lambda t: t[:burn_in], (prev_actions, env_outputs)
        )
        suffix = jax.tree.map(
            lambda t: t[burn_in:], (prev_actions, env_outputs)
        )
        agent_outputs_suffix = jax.tree.map(
            lambda t: t[burn_in:], agent_outputs
        )
        _, training_state = agent.unroll(params, *prefix, agent_state)
        training_state = jax.lax.stop_gradient(training_state)
        _, target_state = agent.unroll(target_params, *prefix, agent_state)
    else:
        suffix = (prev_actions, env_outputs)
        agent_outputs_suffix = agent_outputs
        training_state = agent_state
        target_state = agent_state

    training_output, _ = agent.unroll(params, *suffix, training_state)
    target_output, _ = agent.unroll(target_params, *suffix, target_state)
    env_outputs_suffix = suffix[1]

    if target == "retrace":
        from seed_rl_tpu.ops import value_ops

        loss, priorities = value_ops.retrace_loss_and_priorities(
            training_output.q_values,
            target_output.q_values,
            training_output.action,
            agent_outputs_suffix.action,
            env_outputs_suffix.reward,
            env_outputs_suffix.done,
            gamma=gamma,
            lambda_=retrace_lambda,
            eta=eta,
            rescaling_eps=rescaling_eps,
        )
        return loss, priorities
    assert target == "nstep", target
    loss, priorities = nstep_kernel.td_loss_and_priorities_dispatch(
        training_output.q_values,
        target_output.q_values,
        training_output.action,
        agent_outputs_suffix.action,
        env_outputs_suffix.reward,
        env_outputs_suffix.done,
        gamma=gamma,
        n_steps=n_steps,
        eta=eta,
        rescaling_eps=rescaling_eps,
    )
    return loss, priorities


class R2D2Learner:
    def __init__(
        self,
        engine: RolloutEngine,
        agent: R2D2Agent,
        config: R2D2Config,
        optimizer: optax.GradientTransformation,
    ):
        assert engine.overlap == config.burn_in
        self.engine = engine
        self.agent = agent
        self.config = config
        self.optimizer = optimizer
        self.num_envs = engine.env.num_envs
        self.num_training_envs = self.num_envs - config.num_eval_envs
        assert self.num_training_envs > 0
        self.replay = PrioritizedReplay(
            config.replay_buffer_size, config.importance_sampling_exponent
        )
        self._frames_per_step = (
            engine.unroll_length * self.num_envs * config.num_action_repeats
        )

    @property
    def frames_per_step(self):
        return self._frames_per_step

    def _unroll_to_items(self, unroll) -> StoredUnroll:
        return unroll_to_items(unroll, self.num_training_envs)

    def _initial_priorities(self, items: StoredUnroll):
        return initial_priorities(self.config, items)

    def init(self, rng) -> R2D2TrainState:
        init_rng, rollout_rng, env_rng, state_rng = jax.random.split(rng, 4)
        _, env_output = self.engine.env.reset(env_rng)
        prev_action = jnp.zeros((self.num_envs,), jnp.int32)
        params = self.agent.init_params(init_rng, prev_action, env_output)

        rollout_state = self.engine.init(params, rollout_rng)
        # Build a template unroll to size the replay buffer.
        unroll_shape = jax.eval_shape(
            lambda p, s: self.engine.rollout(p, s)[1], params, rollout_state
        )
        item_shape = jax.eval_shape(
            self._unroll_to_items, unroll_shape
        )
        example_item = jax.tree.map(
            lambda s: jnp.zeros(s.shape[1:], s.dtype), item_shape
        )
        return R2D2TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            replay=self.replay.init_state(example_item),
            rollout=rollout_state,
            stats=episode_stats.init(self.num_training_envs),
            eval_stats=episode_stats.init(
                max(self.config.num_eval_envs, 1)
            ),
            rng=state_rng,
            step=jnp.zeros((), jnp.int32),
        )

    def rollout_params(self, state: R2D2TrainState):
        """Parameters to run rollouts with (eval/driver use)."""
        return state.params

    def _rollout_and_insert(self, state: R2D2TrainState):
        rollout_state, unroll = self.engine.rollout(
            state.params, state.rollout
        )
        items = self._unroll_to_items(unroll)
        priorities = self._initial_priorities(items)
        replay, _ = self.replay.insert(state.replay, items, priorities)

        # Only the last T timesteps are new; the first overlap+1 are shared
        # with the previous unroll (already counted in the stats window).
        new_steps = jax.tree.map(
            lambda x: x[self.engine.overlap + 1:],
            unroll.timesteps.env_output,
        )
        train_steps = jax.tree.map(
            lambda x: x[:, : self.num_training_envs], new_steps
        )
        stats = episode_stats.update(state.stats, train_steps)
        eval_stats = state.eval_stats
        if self.config.num_eval_envs:
            eval_steps = jax.tree.map(
                lambda x: x[:, self.num_training_envs:], new_steps
            )
            eval_stats = episode_stats.update(state.eval_stats, eval_steps)
        return state._replace(
            rollout=rollout_state,
            replay=replay,
            stats=stats,
            eval_stats=eval_stats,
        )

    def warmup_step(self, state: R2D2TrainState) -> R2D2TrainState:
        """Rollout+insert only — used to fill the buffer to min size."""
        return self._rollout_and_insert(state)

    def _train_on_batch(self, carry, _):
        params, target_params, opt_state, replay, rng = carry
        config = self.config
        rng, sample_rng = jax.random.split(rng)
        indices, weights, items = self.replay.sample(
            replay, sample_rng, config.batch_size, config.priority_exponent
        )
        time_major = jax.tree.map(
            lambda t: jnp.swapaxes(t, 0, 1),
            (items.prev_actions, items.env_outputs, items.agent_outputs),
        )
        prev_actions, env_outputs, agent_outputs = time_major

        def loss_fn(p):
            loss, priorities = compute_loss_and_priorities(
                self.agent,
                p,
                target_params,
                items.agent_state,
                prev_actions,
                env_outputs,
                agent_outputs,
                gamma=config.discounting,
                burn_in=config.burn_in,
                n_steps=config.n_steps,
                rescaling_eps=config.value_function_rescaling_epsilon,
                target=config.target,
                retrace_lambda=config.retrace_lambda,
            )
            return jnp.mean(loss * weights), priorities

        (loss, priorities), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        replay = self.replay.update_priorities(replay, indices, priorities)
        logs = {
            "losses/td": loss,
            "grad/norm": grad_norm,
            "replay/sampled_priority_mean": jnp.mean(priorities),
            "replay/importance_weight_mean": jnp.mean(weights),
        }
        return (params, target_params, opt_state, replay, rng), logs

    def train_step(self, state: R2D2TrainState) -> Tuple[R2D2TrainState, dict]:
        config = self.config
        state = self._rollout_and_insert(state)
        rng, train_rng = jax.random.split(state.rng)

        carry = (
            state.params,
            state.target_params,
            state.opt_state,
            state.replay,
            train_rng,
        )
        carry, logs = jax.lax.scan(
            self._train_on_batch, carry, None,
            length=config.train_batches_per_step,
        )
        params, target_params, opt_state, replay, _ = carry
        logs = jax.tree.map(lambda m: jnp.mean(m, axis=0), logs)

        # Hard target update every N steps.
        step = state.step + 1
        do_update = (step % config.update_target_every_n_step) == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(do_update, p, t), target_params, params
        )

        return state._replace(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            replay=replay,
            rng=rng,
            step=step,
        ), logs

    def train_many(self, state, num_steps: int):
        def body(carry, _):
            carry, metrics = self.train_step(carry)
            return carry, metrics

        state, metrics = jax.lax.scan(body, state, None, length=num_steps)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)


class R2D2HostTrainState(NamedTuple):
    """Device-resident train state for the host-replay path (no replay/
    rollout state inside — those live on the host)."""

    params: Any
    target_params: Any
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray  # optimization batches (reference `iterations`)


class R2D2HostLearner:
    """R2D2 over host environments + host-RAM replay at reference scale.

    The split-learner half of the reference's architecture: a host driver
    (``seed_rl_tpu.host_offpolicy.host_offpolicy_loop``) pumps
    rollout-insert (HostRolloutEngine with ``num_overlapping_steps =
    burn_in``) and sample-train through the jitted methods here, with the
    replay buffer in host RAM (``replay_host.HostReplayBuffer``) so the
    reference's 100k-unroll Atari config fits (reference
    agents/r2d2/learner.py:387-468 create_dataset + gcp/train_atari.sh
    replay knobs). Loss/targets/priorities are identical to ``R2D2Learner``.
    """

    init_needs_env = True  # init(rng, prev_action, env_output)

    def __init__(
        self,
        agent: R2D2Agent,
        config: R2D2Config,
        optimizer: optax.GradientTransformation,
        num_envs: int,
        unroll_length: int,
    ):
        self.agent = agent
        self.config = config
        self.optimizer = optimizer
        self.num_envs = num_envs
        self.num_training_envs = num_envs - config.num_eval_envs
        assert self.num_training_envs > 0
        self.unroll_length = unroll_length
        self._frames_per_cycle = (
            unroll_length * num_envs * config.num_action_repeats
        )
        self.priority_exponent = config.priority_exponent
        self.batch_size = config.batch_size

    @property
    def frames_per_cycle(self):
        """Env frames generated by one host rollout cycle."""
        return self._frames_per_cycle

    def init(self, rng, prev_action, env_output) -> R2D2HostTrainState:
        init_rng, state_rng = jax.random.split(rng)
        params = self.agent.init_params(init_rng, prev_action, env_output)
        return R2D2HostTrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            rng=state_rng,
            step=jnp.zeros((), jnp.int32),
        )

    def rollout_params(self, state: R2D2HostTrainState):
        return state.params

    def make_items_and_priorities(self, unroll):
        """Device-side unroll -> (replay items, initial priorities)."""
        items = unroll_to_items(unroll, self.num_training_envs)
        return items, initial_priorities(self.config, items)

    def train_on_batch(self, state: R2D2HostTrainState, items, weights):
        """One optimization batch on host-sampled items.

        Returns (new_state, priorities f32[batch], logs)."""
        config = self.config
        time_major = jax.tree.map(
            lambda t: jnp.swapaxes(t, 0, 1),
            (items.prev_actions, items.env_outputs, items.agent_outputs),
        )
        prev_actions, env_outputs, agent_outputs = time_major

        def loss_fn(p):
            loss, priorities = compute_loss_and_priorities(
                self.agent,
                p,
                state.target_params,
                items.agent_state,
                prev_actions,
                env_outputs,
                agent_outputs,
                gamma=config.discounting,
                burn_in=config.burn_in,
                n_steps=config.n_steps,
                rescaling_eps=config.value_function_rescaling_epsilon,
                target=config.target,
                retrace_lambda=config.retrace_lambda,
            )
            return jnp.mean(loss * weights), priorities

        (loss, priorities), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        step = state.step + 1
        do_update = (step % config.update_target_every_n_step) == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(do_update, p, t),
            state.target_params,
            params,
        )
        logs = {
            "losses/td": loss,
            "grad/norm": grad_norm,
            "replay/sampled_priority_mean": jnp.mean(priorities),
            "replay/importance_weight_mean": jnp.mean(weights),
        }
        return (
            R2D2HostTrainState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                rng=state.rng,
                step=step,
            ),
            priorities,
            logs,
        )


def learner_loop(
    learner: R2D2Learner,
    rng,
    total_environment_frames: int,
    logger=None,
    checkpoint=None,
    log_every_steps: int = 10,
    steps_per_call: int = 1,
) -> R2D2TrainState:
    """Warmup until replay_buffer_min_size, then fused train steps."""
    state = learner.init(rng)
    if checkpoint is not None:
        state = checkpoint.restore_or(state)

    if getattr(learner, "jit_compiled", False):  # DistributedLearner
        warmup = learner.warmup_step
        step_fn = functools.partial(
            learner.train_many, num_steps=steps_per_call
        )
    else:
        # checkify_jit == jax.jit unless --debug_asserts enabled the
        # on-device contract checks (replay bounds/priority validity).
        from seed_rl_tpu.utils import debug_asserts

        warmup = debug_asserts.checkify_jit(learner.warmup_step)
        step_fn = debug_asserts.checkify_jit(
            functools.partial(learner.train_many, num_steps=steps_per_call)
        )
    while (
        int(state.replay.num_inserted)
        < learner.config.replay_buffer_min_size
    ):
        state = warmup(state)
    while int(state.step) * learner.frames_per_step < total_environment_frames:
        state, metrics = step_fn(state)
        step = int(state.step)
        if logger is not None and step % log_every_steps < steps_per_call:
            metrics = dict(metrics)
            for name, stats in (
                ("episodes", state.stats),
                ("eval_episodes", state.eval_stats),
            ):
                n = float(stats.num_episodes)
                if n > 0:
                    metrics[f"{name}/mean_return"] = (
                        float(stats.sum_return) / n
                    )
                    metrics[f"{name}/mean_length"] = (
                        float(stats.sum_length) / n
                    )
            state = state._replace(
                stats=episode_stats.reset_window(state.stats),
                eval_stats=episode_stats.reset_window(state.eval_stats),
            )
            logger.log(
                step, metrics, frames=step * learner.frames_per_step
            )
        if checkpoint is not None:
            checkpoint.maybe_save(step, state)
    if checkpoint is not None:
        checkpoint.maybe_save(int(state.step), state, force=True)
    return state
