"""Soft Actor-Critic (+ optional HER), TPU-native fused learner.

Loss parity with /root/reference/agents/sac/learner.py:110-240:
- actor: DDPG-style pathwise gradient through the sampled action when the
  distribution is reparametrizable (loss = -mean(sg(dQmin/da) * a) -
  alpha*mean(entropy)), otherwise normalized-advantage policy gradient,
- V-loss: V(s) toward sg(min_Q(s, a~pi) - alpha*log pi(a|s)),
- Q-loss: Q(s, a_behaviour) toward r + gamma*(1-d)*next_v, where next_v is
  the target network's V ('v' bootstrap, original SAC) or min-Q of fresh
  next actions plus alpha*entropy ('q' bootstrap, arXiv:1812.05905),
- entropy-constraint alpha adjustment identical to V-trace's Lagrange
  scheme (alpha = exp(speed*param)),
- polyak target updates target <- polyak*target + (1-polyak)*online every
  ``update_target_every_n_step`` minibatches (:402-414),
- HER (:123-134, 295-306): rollouts store her_window_length-step windows;
  sampling relabels goals ('future' strategy) and subsamples training
  unrolls; the Q-bootstrap target uses the *previous* step's desired goal.

Replay is uniform (importance exponent 0), as in the reference (:512-523);
the replay-ratio contract maps to ``train_batches_per_step * batch_size /
insertions_per_step`` in the fused design. Abandoned/truncated episodes
fold into ``done`` (treated as termination, the reference's practical gym
behavior; the reference asserts instead — see the note in
agents/vtrace.py).
"""

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.distributions import ParametricDistribution
from seed_rl_tpu.replay import (
    HindsightExperienceReplay,
    PrioritizedReplay,
    ReplayState,
)
from seed_rl_tpu.rollout import RolloutEngine, RolloutState
from seed_rl_tpu.types import AgentOutput
from seed_rl_tpu.utils import episode_stats


class SACAgent:
    """Rollout-facing wrapper: samples actions from the actor head.

    With ``normalize_observations=True`` the agent reproduces the
    reference's ``NormalizeObservationsWrapper`` around SAC policies
    (common/normalizer.py:155-211 incl. the get_Q/get_V coverage): every
    head sees streaming-mean/std-normalized observations, and the param
    tree becomes ``{"policy": net_params, "obs_norm": NormalizerState}``
    (stats folded once per rollout by the learner).
    """

    def __init__(
        self,
        net,
        distribution: ParametricDistribution,
        normalize_observations: bool = False,
        normalizer_eps: float = 0.001,
        normalizer_clip_range=(-5.0, 5.0),
    ):
        self.net = net
        self.distribution = distribution
        self.normalize_observations = normalize_observations
        self._norm_eps = normalizer_eps
        self._norm_clip = normalizer_clip_range

    def _net_params(self, params):
        return params["policy"] if self.normalize_observations else params

    def _normalized(self, params, env_output):
        if not self.normalize_observations:
            return env_output
        from seed_rl_tpu.ops import normalizer as obs_normalizer

        observation = obs_normalizer.normalize_observation(
            params["obs_norm"], env_output.observation, self._norm_eps,
            self._norm_clip,
        )
        return env_output._replace(observation=observation)

    def update_observation_normalization(self, params, observation,
                                         axis_name=None):
        from seed_rl_tpu.ops import normalizer as obs_normalizer

        return dict(
            params,
            obs_norm=obs_normalizer.update_from_observation(
                params["obs_norm"], observation, axis_name
            ),
        )

    def init_params(self, rng, prev_action, env_output):
        batch = jax.tree.leaves(env_output.observation)[0].shape[0]
        net_params = self.net.init(
            rng, prev_action, env_output, self.net.initial_state(batch)
        )
        if not self.normalize_observations:
            return net_params
        from seed_rl_tpu.ops import normalizer as obs_normalizer

        width = sum(
            int(leaf.shape[-1])
            for leaf in jax.tree.leaves(env_output.observation)
        )
        return {
            "policy": net_params,
            "obs_norm": obs_normalizer.init(width),
        }

    def initial_state(self, batch_size):
        return self.net.initial_state(batch_size)

    @property
    def has_shared_embedding(self) -> bool:
        """True for nets with a shared observation encoder (conv torso).

        For those nets the loss precomputes the embedding ONCE per
        parameter set and the actor/V/Q heads reuse it — without this the
        conv torso runs (and backprops) once per head call, ~3x the
        necessary conv work per trained sample (measured round 5 on the
        visual-Catch bench).
        """
        return hasattr(self.net, "get_embedding")

    def embed(self, params, prev_action, env_output, state):
        """Precompute the net's shared embedding (None if unsupported)."""
        if not self.has_shared_embedding:
            return None
        env_output = self._normalized(params, env_output)
        return self.net.apply(
            self._net_params(params), prev_action, env_output, state,
            method=self.net.get_embedding,
        )

    def action_params(self, params, prev_action, env_output, state,
                      embedding=None):
        if embedding is not None:
            return self.net.apply(
                self._net_params(params), embedding,
                method=self.net.get_action_params_from_embedding,
            )
        env_output = self._normalized(params, env_output)
        return self.net.apply(
            self._net_params(params), prev_action, env_output, state,
            method=self.net.get_action_params,
        )

    def v(self, params, prev_action, env_output, state, embedding=None):
        if embedding is not None:
            return self.net.apply(
                self._net_params(params), embedding,
                method=self.net.get_v_from_embedding,
            )
        env_output = self._normalized(params, env_output)
        return self.net.apply(
            self._net_params(params), prev_action, env_output, state,
            method=self.net.get_v,
        )

    def q(self, params, prev_action, env_output, state, action,
          embedding=None):
        if embedding is not None:
            return self.net.apply(
                self._net_params(params), embedding, action,
                method=self.net.get_q_from_embedding,
            )
        env_output = self._normalized(params, env_output)
        return self.net.apply(
            self._net_params(params), prev_action, env_output, state, action,
            method=self.net.get_q,
        )

    def policy_step(
        self, params, prev_action, env_output, core_state, rng,
        deterministic=False,
    ):
        if getattr(self.net, "stateless", True):
            action_params = self.action_params(
                params, prev_action, env_output, core_state
            )
        else:
            # Recurrent net (ActorCriticLSTM): advance every net's carry.
            action_params, core_state = self.net.apply(
                self._net_params(params), prev_action,
                self._normalized(params, env_output), core_state,
                method=self.net.step,
            )
        if deterministic:
            action = self.distribution.mode(action_params)
        else:
            action = self.distribution.sample(action_params, rng)
        # baseline slot unused by SAC storage; keep AgentOutput shape parity.
        return AgentOutput(
            action, action_params, jnp.zeros(action.shape[:-1], jnp.float32)
        ), core_state


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Defaults = reference flags (agents/sac/learner.py:47-103)."""

    discounting: float = 0.99
    entropy_cost: float = 0.01
    target_entropy: Optional[float] = None
    entropy_cost_adjustment_speed: float = 1.0
    max_abs_reward: float = 0.0
    bootstrap_net: str = "v"  # 'v' or 'q'
    polyak: float = 0.9
    update_target_every_n_step: int = 1
    replay_buffer_size: int = 10_000
    replay_buffer_min_size: int = 256
    batch_size: int = 256
    train_batches_per_step: int = 1
    unroll_length: int = 1  # training unroll (sampled from windows for HER)
    her_window_length: Optional[int] = None
    her_substitution_probability: float = 0.8
    num_action_repeats: int = 1


class StoredUnroll(NamedTuple):
    agent_state: Any
    prev_actions: jnp.ndarray
    env_outputs: Any
    agent_actions: jnp.ndarray


class SACTrainState(NamedTuple):
    params: Any  # {"net": ..., "entropy_cost": scalar}
    target_net_params: Any
    opt_state: Any
    replay: ReplayState
    rollout: RolloutState
    stats: episode_stats.EpisodeStatsState
    rng: jnp.ndarray
    step: jnp.ndarray


def entropy_cost_value(config: SACConfig, param):
    return jnp.exp(config.entropy_cost_adjustment_speed * param)


def compute_loss(
    config: SACConfig,
    agent: SACAgent,
    params,
    target_net_params,
    agent_state,
    prev_actions,
    env_outputs,
    agent_actions,
    rng,
):
    """Time-major [T+1, B] inputs; returns (loss, metrics)."""
    dist = agent.distribution
    net_params = params["net"]
    alpha = entropy_cost_value(config, params["entropy_cost"])
    sg_alpha = jax.lax.stop_gradient(alpha)

    rewards = env_outputs.reward[1:]
    done = env_outputs.done[1:]
    discounts = (~done).astype(jnp.float32) * config.discounting
    if config.max_abs_reward:
        rewards = jnp.clip(
            rewards, -config.max_abs_reward, config.max_abs_reward
        )

    inputs = (
        prev_actions[:-1],
        jax.tree.map(lambda t: t[:-1], env_outputs),
        agent_state,
    )
    if config.her_window_length:
        # Bootstrap against the same (previous step's) desired goal.
        observation = dict(env_outputs.observation)
        observation["desired_goal"] = jnp.concatenate(
            [
                jnp.zeros_like(observation["desired_goal"][:1]),
                observation["desired_goal"][:-1],
            ],
            axis=0,
        )
        target_inputs = (
            prev_actions,
            env_outputs._replace(observation=observation),
            agent_state,
        )
    else:
        target_inputs = (prev_actions, env_outputs, agent_state)

    sample_rng, entropy_rng, next_rng, next_entropy_rng = jax.random.split(
        rng, 4
    )
    # Shared-encoder nets (VisualActorCritic): compute each parameter
    # set's embedding ONCE and reuse it across the actor/V/Q head calls
    # below. Without this the conv torso runs — and backprops — once per
    # head call (~3x the necessary conv work per trained sample, measured
    # round 5). ``emb_in`` is None for nets without a shared encoder, and
    # every head call then takes its original path.
    emb_in = agent.embed(net_params, *inputs)

    action_params = agent.action_params(
        net_params, *inputs, embedding=emb_in
    )
    action = dist.sample(action_params, sample_rng)
    entropy = (
        dist.entropy(action_params, entropy_rng)
        if dist.reparametrizable
        else dist.entropy(action_params)
    )
    v = agent.v(net_params, *inputs, embedding=emb_in)

    logp_action = dist.log_prob(action_params, action)
    q_action = agent.q(
        net_params, *inputs, jax.lax.stop_gradient(action), embedding=emb_in
    )
    min_q = jnp.min(q_action, axis=-1)
    actor_objective = min_q - sg_alpha * logp_action

    if dist.reparametrizable:
        # DDPG-style pathwise gradient: d(min Q)/d(action) at the sample.
        # The embedding is a constant wrt the action, so the inner grad
        # only backprops through the Q heads.
        def min_q_sum(a):
            q = agent.q(
                net_params, *inputs, a,
                embedding=jax.lax.stop_gradient(emb_in)
                if emb_in is not None else None,
            )
            return jnp.sum(jnp.min(q, axis=-1))

        grad_action = jax.grad(min_q_sum)(jax.lax.stop_gradient(action))
        actor_loss = -jnp.mean(
            jax.lax.stop_gradient(grad_action) * action
        ) - sg_alpha * jnp.mean(entropy)
    else:
        advantage = jax.lax.stop_gradient(actor_objective - v)
        advantage = advantage - jnp.mean(advantage)
        advantage = advantage / (jnp.std(advantage) + 0.001)
        actor_loss = -jnp.mean(advantage * logp_action)

    # V-function loss.
    target_v_now = jax.lax.stop_gradient(actor_objective)
    v_error = v - target_v_now
    v_loss = jnp.mean(jnp.square(v_error))

    # Q-function loss on behaviour actions.
    q_old_action = agent.q(
        net_params, *inputs, agent_actions[:-1], embedding=emb_in
    )
    if config.bootstrap_net == "q":
        emb_online_full = agent.embed(net_params, *target_inputs)
        emb_target_full = agent.embed(target_net_params, *target_inputs)
        next_action_params = agent.action_params(
            net_params, *target_inputs, embedding=emb_online_full
        )
        next_action = dist.sample(next_action_params, next_rng)
        next_q = agent.q(
            target_net_params, *target_inputs, next_action,
            embedding=emb_target_full,
        )[1:]
        next_q = jnp.min(next_q, axis=-1)
        next_entropy = (
            dist.entropy(next_action_params, next_entropy_rng)
            if dist.reparametrizable
            else dist.entropy(next_action_params)
        )[1:]
        next_v = next_q + sg_alpha * next_entropy
    elif config.bootstrap_net == "v":
        next_v = agent.v(
            target_net_params, *target_inputs,
            embedding=agent.embed(target_net_params, *target_inputs),
        )[1:]
    else:
        raise ValueError(config.bootstrap_net)

    target_q = jax.lax.stop_gradient(rewards + discounts * next_v)
    q_error = q_old_action - target_q[..., None]
    q_loss = jnp.mean(jnp.square(q_error))

    if config.target_entropy is not None:
        entropy_adjustment_loss = alpha * jax.lax.stop_gradient(
            jnp.mean(entropy) - config.target_entropy
        )
    else:
        entropy_adjustment_loss = 0.0 * alpha

    total_loss = actor_loss + q_loss + v_loss + entropy_adjustment_loss
    metrics = {
        "Q/value": jnp.mean(q_action),
        "Q/L2_error": jnp.sqrt(jnp.mean(jnp.square(q_error))),
        "V/value": jnp.mean(v),
        "V/L2_error": jnp.sqrt(jnp.mean(jnp.square(v_error))),
        "losses/actor": actor_loss,
        "losses/Q": q_loss,
        "losses/V": v_loss,
        "losses/total": total_loss,
        "policy/entropy": jnp.mean(entropy),
        "policy/entropy_cost": alpha,
    }
    return total_loss, metrics


class SACLearner:
    def __init__(
        self,
        engine: RolloutEngine,
        agent: SACAgent,
        config: SACConfig,
        optimizer: optax.GradientTransformation,
        compute_reward_fn=None,
    ):
        self.engine = engine
        self.agent = agent
        self.config = config
        self.optimizer = optimizer
        self.num_envs = engine.env.num_envs
        if config.her_window_length:
            assert engine.unroll_length == config.her_window_length
            assert compute_reward_fn is not None
            self.replay = HindsightExperienceReplay(
                config.replay_buffer_size,
                importance_sampling_exponent=0.0,
                compute_reward_fn=compute_reward_fn,
                unroll_length=config.unroll_length,
                substitution_probability=(
                    config.her_substitution_probability
                ),
            )
        else:
            assert engine.unroll_length == config.unroll_length
            self.replay = PrioritizedReplay(
                config.replay_buffer_size, importance_sampling_exponent=0.0
            )
        self._frames_per_step = (
            engine.unroll_length * self.num_envs * config.num_action_repeats
        )

    @property
    def frames_per_step(self):
        return self._frames_per_step

    def rollout_params(self, state: SACTrainState):
        """Parameters to run rollouts with (eval/driver use)."""
        return state.params["net"]

    def _unroll_to_items(self, unroll) -> StoredUnroll:
        ts = unroll.timesteps

        def to_items(t):
            return jnp.swapaxes(t, 0, 1)

        return StoredUnroll(
            agent_state=unroll.agent_state,
            prev_actions=jax.tree.map(to_items, ts.prev_action),
            env_outputs=jax.tree.map(to_items, ts.env_output),
            agent_actions=jax.tree.map(to_items, ts.agent_output.action),
        )

    def init(self, rng) -> SACTrainState:
        init_rng, rollout_rng, env_rng, state_rng = jax.random.split(rng, 4)
        _, env_output = self.engine.env.reset(env_rng)
        prev_action = self.engine._batch_zero_action(self.num_envs)
        net_params = self.agent.init_params(init_rng, prev_action, env_output)
        mul = self.config.entropy_cost_adjustment_speed
        params = {
            "net": net_params,
            "entropy_cost": jnp.asarray(
                jnp.log(self.config.entropy_cost) / mul, jnp.float32
            ),
        }
        rollout_state = self.engine.init(net_params, rollout_rng)
        unroll_shape = jax.eval_shape(
            lambda p, s: self.engine.rollout(p, s)[1],
            net_params,
            rollout_state,
        )
        item_shape = jax.eval_shape(self._unroll_to_items, unroll_shape)
        example_item = jax.tree.map(
            lambda s: jnp.zeros(s.shape[1:], s.dtype), item_shape
        )
        return SACTrainState(
            params=params,
            target_net_params=net_params,
            opt_state=self.optimizer.init(params),
            replay=self.replay.init_state(example_item),
            rollout=rollout_state,
            stats=episode_stats.init(self.num_envs),
            rng=state_rng,
            step=jnp.zeros((), jnp.int32),
        )

    def _rollout_and_insert(self, state: SACTrainState):
        rollout_state, unroll = self.engine.rollout(
            state.params["net"], state.rollout
        )
        items = self._unroll_to_items(unroll)
        replay, _ = self.replay.insert(
            state.replay, items, jnp.ones((self.num_envs,), jnp.float32)
        )
        new_steps = jax.tree.map(
            lambda x: x[1:], unroll.timesteps.env_output
        )
        stats = episode_stats.update(state.stats, new_steps)
        params = state.params
        if self.agent.normalize_observations:
            # Fold fresh observations into the normalization statistics
            # (reference end_of_training_step_callback, normalizer.py:197).
            params = dict(
                params,
                net=self.agent.update_observation_normalization(
                    params["net"], new_steps.observation
                ),
            )
        return state._replace(
            params=params, rollout=rollout_state, replay=replay, stats=stats
        )

    def warmup_step(self, state):
        return self._rollout_and_insert(state)

    def _train_on_batch(self, carry, _):
        params, target_net, opt_state, replay, rng, step = carry
        config = self.config
        rng, sample_rng, loss_rng = jax.random.split(rng, 3)
        _, _, items = self.replay.sample(
            replay, sample_rng, config.batch_size, priority_exp=0
        )
        time_major = jax.tree.map(
            lambda t: jnp.swapaxes(t, 0, 1),
            (items.prev_actions, items.env_outputs, items.agent_actions),
        )
        prev_actions, env_outputs, agent_actions = time_major

        def loss_fn(p):
            return compute_loss(
                config,
                self.agent,
                p,
                target_net,
                items.agent_state,
                prev_actions,
                env_outputs,
                agent_actions,
                loss_rng,
            )

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        metrics["grad/norm"] = optax.global_norm(grads)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mul = config.entropy_cost_adjustment_speed
        params = dict(
            params,
            entropy_cost=jnp.clip(
                params["entropy_cost"], -20.0 / mul, 20.0 / mul
            ),
        )

        # Polyak target update every n minibatches.
        step = step + 1
        do_update = (step % config.update_target_every_n_step) == 0
        polyak = jnp.where(do_update, config.polyak, 1.0)
        target_net = jax.tree.map(
            lambda t, p: polyak * t + (1.0 - polyak) * p,
            target_net,
            params["net"],
        )
        return (params, target_net, opt_state, replay, rng, step), metrics

    def train_step(self, state: SACTrainState):
        state = self._rollout_and_insert(state)
        rng, train_rng = jax.random.split(state.rng)
        carry = (
            state.params,
            state.target_net_params,
            state.opt_state,
            state.replay,
            train_rng,
            state.step * self.config.train_batches_per_step,
        )
        carry, metrics = jax.lax.scan(
            self._train_on_batch,
            carry,
            None,
            length=self.config.train_batches_per_step,
        )
        params, target_net, opt_state, replay, _, _ = carry
        metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
        return state._replace(
            params=params,
            target_net_params=target_net,
            opt_state=opt_state,
            replay=replay,
            rng=rng,
            step=state.step + 1,
        ), metrics

    def train_many(self, state, num_steps: int):
        def body(carry, _):
            carry, metrics = self.train_step(carry)
            return carry, metrics

        state, metrics = jax.lax.scan(body, state, None, length=num_steps)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)


class SACHostTrainState(NamedTuple):
    """Device train state for the host-env SAC path (replay on the host)."""

    params: Any  # {"net": ..., "entropy_cost": scalar}
    target_net_params: Any
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray  # optimization batches


class SACHostLearner:
    """SAC over host environments (MuJoCo/Gym) + host-RAM uniform replay.

    The reference SAC is a MuJoCo/Gym actor-fleet agent
    (/root/reference/mujoco/sac_main.py; agents/sac/learner.py:324-650 with
    replay_buffer_size 1e6 transitions, replay_ratio 4, uniform sampling
    :512-523). This learner provides the sample-train half for the
    ``host_offpolicy_loop`` driver; the loss is ``compute_loss`` above
    (identical math to the fused ``SACLearner``).
    """

    init_needs_env = True  # init(rng, prev_action, env_output)

    def __init__(
        self,
        agent: SACAgent,
        config: SACConfig,
        optimizer: optax.GradientTransformation,
        num_envs: int,
        unroll_length: int,
    ):
        self.agent = agent
        self.config = config
        self.optimizer = optimizer
        self.num_envs = num_envs
        self.num_training_envs = num_envs  # SAC has no dedicated eval envs
        self.unroll_length = unroll_length
        self._frames_per_cycle = (
            unroll_length * num_envs * config.num_action_repeats
        )
        self.priority_exponent = 0.0  # uniform replay (reference :512-523)
        self.batch_size = config.batch_size

    @property
    def frames_per_cycle(self):
        return self._frames_per_cycle

    def init(self, rng, prev_action, env_output) -> SACHostTrainState:
        init_rng, state_rng = jax.random.split(rng)
        net_params = self.agent.init_params(init_rng, prev_action, env_output)
        mul = self.config.entropy_cost_adjustment_speed
        params = {
            "net": net_params,
            "entropy_cost": jnp.asarray(
                jnp.log(self.config.entropy_cost) / mul, jnp.float32
            ),
        }
        return SACHostTrainState(
            params=params,
            target_net_params=net_params,
            opt_state=self.optimizer.init(params),
            rng=state_rng,
            step=jnp.zeros((), jnp.int32),
        )

    def rollout_params(self, state: SACHostTrainState):
        return state.params["net"]

    def make_items_and_priorities(self, unroll):
        ts = unroll.timesteps

        def to_items(t):
            return jnp.swapaxes(t, 0, 1)

        items = StoredUnroll(
            agent_state=unroll.agent_state,
            prev_actions=jax.tree.map(to_items, ts.prev_action),
            env_outputs=jax.tree.map(to_items, ts.env_output),
            agent_actions=jax.tree.map(to_items, ts.agent_output.action),
        )
        return items, jnp.ones((self.num_envs,), jnp.float32)

    def on_unroll(self, state: SACHostTrainState, unroll):
        """Fold fresh observations into the normalization statistics."""
        if not self.agent.normalize_observations:
            return state
        new_steps = jax.tree.map(
            lambda x: x[1:], unroll.timesteps.env_output
        )
        params = dict(
            state.params,
            net=self.agent.update_observation_normalization(
                state.params["net"], new_steps.observation
            ),
        )
        return state._replace(params=params)

    def train_on_batch(self, state: SACHostTrainState, items, weights):
        config = self.config
        rng, loss_rng = jax.random.split(state.rng)
        time_major = jax.tree.map(
            lambda t: jnp.swapaxes(t, 0, 1),
            (items.prev_actions, items.env_outputs, items.agent_actions),
        )
        prev_actions, env_outputs, agent_actions = time_major

        def loss_fn(p):
            return compute_loss(
                config,
                self.agent,
                p,
                state.target_net_params,
                items.agent_state,
                prev_actions,
                env_outputs,
                agent_actions,
                loss_rng,
            )

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        metrics["grad/norm"] = optax.global_norm(grads)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        mul = config.entropy_cost_adjustment_speed
        params = dict(
            params,
            entropy_cost=jnp.clip(
                params["entropy_cost"], -20.0 / mul, 20.0 / mul
            ),
        )

        step = state.step + 1
        do_update = (step % config.update_target_every_n_step) == 0
        polyak = jnp.where(do_update, config.polyak, 1.0)
        target_net = jax.tree.map(
            lambda t, p: polyak * t + (1.0 - polyak) * p,
            state.target_net_params,
            params["net"],
        )
        priorities = jnp.ones((config.batch_size,), jnp.float32)
        return (
            SACHostTrainState(
                params=params,
                target_net_params=target_net,
                opt_state=opt_state,
                rng=rng,
                step=step,
            ),
            priorities,
            metrics,
        )
