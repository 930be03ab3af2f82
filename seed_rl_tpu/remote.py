"""Remote-actor training: learner serves inference over a unix socket.

The deployment shape of the reference (gcp/run.py:54-68: K worker VMs x
actors_per_worker processes, one learner): actor processes run
``--run_mode=actor`` (env stepping only, one blocking inference call per
env step — common/actor.py:45-185) against a learner process running
``--run_mode=learner`` which batches the calls in the native C++ batcher,
runs the jitted policy, accumulates unrolls in a HostUnrollStore, and
trains on dequeued unroll batches (agents/vtrace/learner.py:314-483).

The learner's env is used for SPEC INFERENCE ONLY (reference learner
docstring, vtrace/learner.py:174-178) — no learner-side env stepping.

Episode metrics in remote mode are EXACT-OR-OMITTED: ``PerEnvEpisodeStats``
keys accumulators by global env id (the reference's env_infos Aggregator
keyed by env_id, vtrace learner.py:373-378), so unroll batches of varying
env composition never mix accumulators; when an actor restart or a
backpressure drop loses part of an episode, that episode is invalidated
and omitted rather than reported with a corrupt partial return.
"""

import collections
import time
from typing import Optional

import numpy as np


class PerEnvEpisodeStats:
    """Host-side episode accounting keyed by global env id.

    The remote equivalent of ``utils.episode_stats`` (itself the
    reference's env_infos Aggregator + info_queue, vtrace
    learner.py:373-378): per-env return accumulators indexed by env id and
    a windowed sum over completed episodes. ``completed_returns`` keeps the
    most recent returns per env so tests can assert learner-side accounting
    matches actor-side exactly.
    """

    def __init__(self, num_envs: int, keep_last: int = 16):
        self.return_acc = np.zeros((num_envs,), np.float64)
        self.num_episodes = 0
        self.sum_return = 0.0
        self.sum_length = 0.0
        self.completed_returns = collections.defaultdict(
            lambda: collections.deque(maxlen=keep_last)
        )

    def invalidate(self, env_id: int) -> None:
        """Mark an env's running episode unknown (actor restart, dropped
        unroll): its in-flight episode is OMITTED from the stats rather
        than reported with a corrupt partial return; accounting resumes
        exactly at the next episode boundary."""
        self.return_acc[env_id] = np.nan

    def _consume(self, env_id, reward, done, episode_step) -> None:
        acc = self.return_acc[env_id]
        for t in range(reward.shape[0]):
            acc += reward[t]
            if done[t]:
                if not np.isnan(acc):
                    self.num_episodes += 1
                    self.sum_return += acc
                    self.sum_length += float(episode_step[t])
                    self.completed_returns[env_id].append(acc)
                acc = 0.0  # boundary: accounting is exact again
        self.return_acc[env_id] = acc

    def update_unroll(self, env_id: int, env_outputs) -> None:
        """Consume one env's NEW timesteps ([T] leaves, overlap excluded)."""
        self._consume(
            env_id,
            np.asarray(env_outputs.reward, np.float64),
            np.asarray(env_outputs.done, bool),
            np.asarray(env_outputs.episode_step),
        )

    def update_batch(self, env_ids, env_outputs) -> None:
        """Consume a time-major [T, B] block; column b belongs to
        ``env_ids[b]``. Batch order preserves each env's arrival order, so
        multiple unrolls of one env in a batch stay sequential. Only the
        scalar fields are pulled to host — observations are never read
        (one bulk D2H instead of per-column full-tree transfers)."""
        reward = np.asarray(env_outputs.reward, np.float64)
        done = np.asarray(env_outputs.done, bool)
        episode_step = np.asarray(env_outputs.episode_step)
        for b, env_id in enumerate(np.asarray(env_ids)):
            self._consume(
                int(env_id), reward[:, b], done[:, b], episode_step[:, b]
            )

    def window_metrics(self, prefix: str = "episodes"):
        """Mean return/length over the window; None if no episode ended."""
        if not self.num_episodes:
            return None
        metrics = {
            f"{prefix}/mean_return": self.sum_return / self.num_episodes,
            f"{prefix}/mean_length": self.sum_length / self.num_episodes,
            f"{prefix}/num_episodes": float(self.num_episodes),
        }
        self.num_episodes = 0
        self.sum_return = 0.0
        self.sum_length = 0.0
        return metrics


class SpecHostEnv:
    """Spec-only stand-in for the learner's env (never stepped)."""

    def __init__(self, observation_spec, action_space, num_envs: int):
        self._observation_spec = observation_spec
        self.action_space = action_space
        self.num_envs = num_envs

    def observation_spec(self):
        return self._observation_spec

    def reset(self, seed: int = 0):
        import jax

        from seed_rl_tpu.types import EnvOutput

        n = self.num_envs
        obs = jax.tree.map(
            lambda s: np.zeros((n,) + tuple(s.shape), s.dtype),
            self._observation_spec,
        )
        return EnvOutput(
            reward=np.zeros(n, np.float32),
            done=np.zeros(n, bool),
            observation=obs,
            abandoned=np.zeros(n, bool),
            episode_step=np.zeros(n, np.int32),
        )

    def close(self):
        pass


def _single_env_specs(observation_spec, agent, zero_action):
    """Derive (timestep_specs, request_specs, result_specs) for the bridge.

    ``zero_action``: a single-env example action (no batch dim). AgentOutput
    specs come from ``jax.eval_shape`` of one policy step — signature
    discovery without running the net (the JAX equivalent of the
    reference's TypeSpec plumbing, grpc.cc:145-153)."""
    import jax
    import jax.numpy as jnp

    from seed_rl_tpu.types import EnvOutput

    env_output_specs = EnvOutput(
        reward=jax.ShapeDtypeStruct((), np.float32),
        done=jax.ShapeDtypeStruct((), bool),
        observation=jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(tuple(s.shape), s.dtype),
            observation_spec,
        ),
        abandoned=jax.ShapeDtypeStruct((), bool),
        episode_step=jax.ShapeDtypeStruct((), np.int32),
    )
    action_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(tuple(jnp.shape(x)), x.dtype),
        zero_action,
    )

    import inspect

    pass_env_ids = (
        "env_ids" in inspect.signature(agent.policy_step).parameters
    )

    def one_step(params):
        prev = jax.tree.map(lambda s: jnp.zeros((1,) + s.shape, s.dtype),
                            action_spec)
        out = jax.tree.map(
            lambda s: jnp.zeros((1,) + tuple(s.shape), s.dtype),
            env_output_specs,
        )
        kwargs = (
            {"env_ids": jnp.zeros((1,), jnp.int32)} if pass_env_ids else {}
        )
        agent_output, _ = agent.policy_step(
            params, prev, out, agent.initial_state(1),
            jax.random.PRNGKey(0), **kwargs,
        )
        return agent_output

    return env_output_specs, action_spec, one_step


def run_remote_learner(
    agent,
    learner,
    observation_spec,
    server_address: str,
    total_environment_frames: int,
    unroll_length: int,
    num_envs: int,
    inference_batch_size: int = 0,
    num_overlapping_steps: int = 0,
    logger=None,
    checkpoint=None,
    log_every_steps: int = 10,
    config_push=None,
    rng=None,
    stats_sink=None,
):
    """Serve inference at ``server_address``; train on streamed unrolls.

    Returns the final train state. ``learner`` must expose ``init`` /
    ``rollout_params`` / ``update(state, unroll, rng)`` (V-trace/PPO
    host-engine learners). ``stats_sink``: optional dict; the loop stores
    its ``PerEnvEpisodeStats`` under ``"episodes"`` for callers/tests.
    """
    import jax
    import jax.numpy as jnp

    from seed_rl_tpu.runtime.actor import InferenceBridge
    from seed_rl_tpu.runtime.inference_server import InferenceServer

    if rng is None:
        rng = jax.random.PRNGKey(0)
    init_rng, loop_rng = jax.random.split(rng)
    state = learner.init(init_rng)
    if checkpoint is not None:
        state = checkpoint.restore_or(state)
    params_holder = {"params": learner.rollout_params(state)}

    engine = learner.engine
    env_output_specs, action_spec, one_step = _single_env_specs(
        observation_spec, agent, engine._zero_action
    )
    agent_output_batched = jax.eval_shape(
        one_step, params_holder["params"]
    )
    agent_output_spec = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(tuple(s.shape[1:]), s.dtype),
        agent_output_batched,
    )
    timestep_specs = (action_spec, env_output_specs, agent_output_spec)

    bridge = InferenceBridge(
        agent,
        params_fn=lambda: params_holder["params"],
        num_envs=num_envs,
        unroll_length=unroll_length,
        timestep_specs=timestep_specs,
        num_overlapping_steps=num_overlapping_steps,
        example_action=np.zeros(
            tuple(jax.tree.leaves(action_spec)[0].shape),
            jax.tree.leaves(action_spec)[0].dtype,
        ),
    )
    request_specs = (
        jax.ShapeDtypeStruct((), np.int64),  # run_id
        env_output_specs,
    )
    result_specs = (jax.tree.leaves(action_spec)[0],)
    if not inference_batch_size:
        # Reference auto-tune: max(env_batch_size, num_envs / (2*num_hosts))
        # (common/utils.py:989-1002); one host here.
        inference_batch_size = max(1, num_envs // 2)
    server = InferenceServer(
        [bridge.handler],
        request_specs,
        result_specs,
        batch_size=inference_batch_size,
        flush_timeout_ms=50,
    )
    server.serve_unix(server_address, config=config_push)

    update = jax.jit(learner.update)
    batch_size = num_envs  # one unroll per env per training batch
    frames_per_batch = batch_size * unroll_length
    frames = 0
    step = 0
    # Exact per-env episode accounting keyed by env id (the reference's
    # env_infos Aggregator, vtrace learner.py:373-378). Actor restarts and
    # backpressure drops invalidate the affected envs' in-flight episodes
    # (omitted, never reported corrupt).
    ep_stats = PerEnvEpisodeStats(num_envs)
    bridge.on_unroll_lost = lambda ids: [
        ep_stats.invalidate(int(e)) for e in ids
    ]
    if stats_sink is not None:
        stats_sink["episodes"] = ep_stats
    try:
        while frames < total_environment_frames:
            env_ids, unroll = bridge.next_unroll_batch(
                batch_size, timeout=300.0, with_env_ids=True
            )
            loop_rng, step_rng = jax.random.split(loop_rng)
            state, metrics = update(state, unroll, step_rng)
            params_holder["params"] = learner.rollout_params(state)
            new_steps = jax.tree.map(
                lambda x: x[1:], unroll.timesteps.env_output
            )
            ep_stats.update_batch(env_ids, new_steps)
            frames += frames_per_batch
            step = int(state.step)
            if logger is not None and step % log_every_steps == 0:
                metrics = dict(metrics)
                metrics["server/total_batches"] = server.stats[
                    "total_batches"
                ]
                metrics["server/connections"] = server.stats.get(
                    "connections", 0
                )
                ep = ep_stats.window_metrics()
                if ep:
                    metrics.update(ep)
                logger.log(step, metrics, frames=frames)
            if checkpoint is not None:
                checkpoint.maybe_save(step, state)
        if checkpoint is not None:
            checkpoint.maybe_save(step, state, force=True)
    finally:
        server.shutdown()
    return state


def run_remote_offpolicy_learner(
    agent,
    learner,
    replay,
    observation_spec,
    server_address: str,
    total_environment_frames: int,
    unroll_length: int,
    num_envs: int,
    replay_ratio: float,
    replay_buffer_min_size: int,
    example_action,
    num_training_envs: Optional[int] = None,
    num_overlapping_steps: int = 0,
    inference_batch_size: int = 0,
    logger=None,
    checkpoint=None,
    log_every_cycles: int = 10,
    config_push=None,
    rng=None,
    max_train_batches_per_cycle: Optional[int] = None,
    unroll_timeout: float = 300.0,
    stats_sink=None,
    replay_dir: Optional[str] = None,
):
    """Off-policy remote training: R2D2/SAC served to external actor fleets.

    The reference's R2D2/SAC learner shape (agents/r2d2/learner.py:765-822,
    agents/sac/learner.py:539-556 + gcp/train_atari.sh 32 workers x 20
    actors): the learner serves batched inference over the socket transport
    (per-env epsilon ladders applied BY ENV ID via the bridge), accumulates
    streamed timesteps into burn-in-overlapped unrolls, inserts training-env
    unrolls (env_id < num_training_envs; eval experience is never stored,
    r2d2 learner.py:793-803) into host-RAM replay with initial priorities,
    and trains under the replay-ratio contract exactly like
    ``host_offpolicy_loop``.

    ``learner``: an R2D2HostLearner/SACHostLearner whose ``num_envs`` is
    the INSERTION BATCH (unrolls per insert cycle), typically
    ``max(1, round(batch_size / replay_ratio))`` (reference insertion_batch,
    r2d2 learner.py:113-117). ``example_action``: one env's action (no
    batch dim). ``stats_sink``: optional dict populated with the
    ``PerEnvEpisodeStats`` under ``"episodes"`` / ``"eval_episodes"``.

    Returns the final device train state.
    """
    import jax
    import jax.numpy as jnp

    from seed_rl_tpu.runtime.actor import InferenceBridge
    from seed_rl_tpu.runtime.inference_server import InferenceServer

    if rng is None:
        rng = jax.random.PRNGKey(0)
    n_train = num_training_envs if num_training_envs else num_envs
    insertion_batch = learner.num_envs
    init_rng, _ = jax.random.split(rng)

    example_action = np.asarray(example_action)
    prev_action0 = np.broadcast_to(
        np.zeros_like(example_action),
        (insertion_batch,) + example_action.shape,
    ).copy()
    env_output0 = SpecHostEnv(
        observation_spec, None, insertion_batch
    ).reset()
    state = jax.jit(learner.init)(
        init_rng, jnp.asarray(prev_action0), jax.tree.map(jnp.asarray,
                                                          env_output0)
    )
    if checkpoint is not None:
        state = checkpoint.restore_or(state)
    if replay_dir is not None and replay.restore(replay_dir):
        print(
            f"Restored replay buffer from {replay_dir}: "
            f"{replay.num_inserted} items",
            flush=True,
        )
    params_holder = {"params": learner.rollout_params(state)}

    env_output_specs, action_spec, one_step = _single_env_specs(
        observation_spec, agent, jnp.zeros_like(jnp.asarray(example_action))
    )
    agent_output_batched = jax.eval_shape(one_step, params_holder["params"])
    agent_output_spec = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(tuple(s.shape[1:]), s.dtype),
        agent_output_batched,
    )
    timestep_specs = (action_spec, env_output_specs, agent_output_spec)

    bridge = InferenceBridge(
        agent,
        params_fn=lambda: params_holder["params"],
        num_envs=num_envs,
        unroll_length=unroll_length,
        timestep_specs=timestep_specs,
        num_overlapping_steps=num_overlapping_steps,
        example_action=example_action,
    )
    request_specs = (
        jax.ShapeDtypeStruct((), np.int64),  # run_id
        env_output_specs,
    )
    result_specs = (jax.tree.leaves(action_spec)[0],)
    if not inference_batch_size:
        # Reference auto-tune: max(env_batch_size, num_envs/(2*num_hosts))
        # (common/utils.py:989-1002); one host here.
        inference_batch_size = max(1, num_envs // 2)
    server = InferenceServer(
        [bridge.handler],
        request_specs,
        result_specs,
        batch_size=inference_batch_size,
        flush_timeout_ms=50,
    )
    server.serve(server_address, config=config_push)

    make_items = jax.jit(learner.make_items_and_priorities)
    train = jax.jit(learner.train_on_batch)
    on_unroll = (
        jax.jit(learner.on_unroll) if hasattr(learner, "on_unroll") else None
    )

    new_slice = num_overlapping_steps + 1
    ep_stats = PerEnvEpisodeStats(num_envs)
    eval_stats = PerEnvEpisodeStats(num_envs)

    def _on_unroll_lost(ids):
        # Restart/drop invalidation: omit the affected in-flight episodes
        # instead of reporting corrupt partial returns.
        for e in np.asarray(ids):
            (ep_stats if int(e) < n_train else eval_stats).invalidate(
                int(e)
            )

    bridge.on_unroll_lost = _on_unroll_lost
    if stats_sink is not None:
        stats_sink["episodes"] = ep_stats
        stats_sink["eval_episodes"] = eval_stats

    def eval_sink(env_id, first_state, item_timesteps):
        # item_timesteps = (prev_actions, env_outputs, agent_outputs) with
        # item-major [T_total, ...] leaves for one env.
        del first_state
        _, env_outputs, _ = item_timesteps
        eval_stats.update_unroll(
            env_id, jax.tree.map(lambda x: x[new_slice:], env_outputs)
        )

    owed = 0.0
    cycles = 0
    frames = 0
    window_logs = []
    priority_exp = getattr(learner, "priority_exponent", 0.0)
    batch_size = learner.batch_size
    frames_per_cycle = getattr(
        learner, "frames_per_cycle", insertion_batch * unroll_length
    )
    step = 0
    try:
        while frames < total_environment_frames:
            env_ids, unroll = bridge.next_unroll_batch(
                insertion_batch,
                timeout=unroll_timeout,
                with_env_ids=True,
                training_only_below=n_train,
                excluded_sink=eval_sink,
            )
            if on_unroll is not None:
                # Folds fresh observations into normalization stats —
                # params change without an optimizer step, so refresh the
                # inference snapshot.
                state = on_unroll(state, unroll)
                params_holder["params"] = learner.rollout_params(state)
            items, priorities = make_items(unroll)
            replay.insert(items, priorities)
            new_steps = jax.tree.map(
                lambda x: x[new_slice:], unroll.timesteps.env_output
            )
            ep_stats.update_batch(env_ids, new_steps)
            cycles += 1
            frames += frames_per_cycle

            if replay.num_inserted >= replay_buffer_min_size:
                owed += replay_ratio * insertion_batch / batch_size
                budget = int(owed)
                if max_train_batches_per_cycle is not None:
                    budget = min(budget, max_train_batches_per_cycle)
                for k in range(budget):
                    owed -= 1.0
                    if replay._prefetch_thread is None:
                        replay.sample_async(batch_size, priority_exp)
                    indices, weights, items_b = replay.wait_sample()
                    state, new_priorities, logs = train(
                        state, items_b, jnp.asarray(weights)
                    )
                    if k + 1 < budget:
                        replay.sample_async(batch_size, priority_exp)
                    if priority_exp:
                        replay.update_priorities(
                            indices, np.asarray(new_priorities)
                        )
                    window_logs.append(logs)
                params_holder["params"] = learner.rollout_params(state)

            step = int(state.step)
            if logger is not None and cycles % log_every_cycles == 0:
                metrics = {}
                if window_logs:
                    stacked = jax.tree.map(
                        lambda *xs: float(
                            np.mean([np.asarray(x) for x in xs])
                        ),
                        *window_logs,
                    )
                    metrics.update(stacked)
                    window_logs = []
                ep = ep_stats.window_metrics()
                if ep:
                    metrics.update(ep)
                ev = eval_stats.window_metrics("eval_episodes")
                if ev:
                    metrics.update(ev)
                metrics["replay/num_inserted"] = replay.num_inserted
                metrics["replay/ram_gb"] = round(
                    replay.nbytes() / 2**30, 3
                )
                metrics["server/total_batches"] = server.stats[
                    "total_batches"
                ]
                metrics["server/connections"] = server.stats.get(
                    "connections", 0
                )
                logger.log(step, metrics, frames=frames)
            if checkpoint is not None:
                if checkpoint.maybe_save(step, state):
                    if replay_dir is not None:
                        replay.save(replay_dir)
        if checkpoint is not None:
            checkpoint.maybe_save(step, state, force=True)
            if replay_dir is not None:
                replay.save(replay_dir)
    finally:
        server.shutdown()
    return state


def run_actor(
    create_env_fn,
    server_address: str,
    num_steps: Optional[int] = None,
    env_id_offset: int = 0,
    timer_export_fn=None,
    max_reconnects: int = 20,
    connect_timeout: float = 120.0,
):
    """Actor process entry: host envs + blocking socket inference.

    ``create_env_fn() -> HostBatchedEnv``; env ids are
    ``env_id_offset + i`` (reference env_id = task * env_batch_size + i,
    common/actor.py:77). Transport errors tear down and rebuild client +
    envs, exactly the reference's reconnect loop (actor.py:71-74, 182-185)
    — including waiting for a learner that has not bound its socket yet.
    """
    from seed_rl_tpu.runtime.actor import actor_loop
    from seed_rl_tpu.runtime.transport import RemoteActorClient

    reconnects = 0
    steps_done = 0
    while True:
        try:
            client = RemoteActorClient(
                server_address, connect_timeout=connect_timeout
            )
        except (ConnectionError, OSError):
            reconnects += 1
            if reconnects > max_reconnects:
                raise
            time.sleep(0.5)
            continue
        try:
            remaining = None if num_steps is None else num_steps - steps_done
            if remaining is not None and remaining <= 0:
                return steps_done
            # max_reconnects=0: transport errors surface here so the
            # connection (not just the envs) is rebuilt.
            steps_done += actor_loop(
                create_env_fn,
                client,
                num_steps=remaining,
                env_id_offset=env_id_offset,
                timer_export_fn=timer_export_fn,
                max_reconnects=0,
                # Concurrent per-env calls need one connection per pool
                # thread (SocketClient is one-call-at-a-time).
                client_factory=lambda: RemoteActorClient(
                    server_address, connect_timeout=connect_timeout
                ),
            )
            return steps_done
        except (RuntimeError, ConnectionError, OSError):
            reconnects += 1
            if reconnects > max_reconnects:
                raise
            time.sleep(0.5)
        finally:
            client.close()
