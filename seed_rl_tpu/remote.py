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

Note on episode metrics: in remote mode the learner's per-slot episode
accumulators mix envs when unroll batch composition varies between
dequeues, so ``episodes/mean_return`` is an approximation; exact per-env
episode accounting is actor-side (the reference logs it there too,
actor.py:152-160).
"""

import time
from typing import Optional

import numpy as np


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


def _single_env_specs(observation_spec, agent, engine, num_actions_rng=None):
    """Derive (timestep_specs, request_specs, result_specs) for the bridge.

    AgentOutput specs come from ``jax.eval_shape`` of one policy step —
    signature discovery without running the net (the JAX equivalent of the
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
    zero_action = engine._zero_action
    action_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(tuple(jnp.shape(x)), x.dtype),
        zero_action,
    )

    def one_step(params):
        prev = jax.tree.map(lambda s: jnp.zeros((1,) + s.shape, s.dtype),
                            action_spec)
        out = jax.tree.map(
            lambda s: jnp.zeros((1,) + tuple(s.shape), s.dtype),
            env_output_specs,
        )
        agent_output, _ = agent.policy_step(
            params, prev, out, agent.initial_state(1),
            jax.random.PRNGKey(0),
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
):
    """Serve inference at ``server_address``; train on streamed unrolls.

    Returns the final train state. ``learner`` must expose ``init`` /
    ``rollout_params`` / ``update(state, unroll, rng)`` (V-trace/PPO
    host-engine learners).
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
        observation_spec, agent, engine
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
    try:
        while frames < total_environment_frames:
            unroll = bridge.next_unroll_batch(batch_size, timeout=300.0)
            loop_rng, step_rng = jax.random.split(loop_rng)
            state, metrics = update(state, unroll, step_rng)
            params_holder["params"] = learner.rollout_params(state)
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
                logger.log(step, metrics, frames=frames)
            if checkpoint is not None:
                checkpoint.maybe_save(step, state)
        if checkpoint is not None:
            checkpoint.maybe_save(step, state, force=True)
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
            )
            return steps_done
        except (RuntimeError, ConnectionError, OSError):
            reconnects += 1
            if reconnects > max_reconnects:
                raise
            time.sleep(0.5)
        finally:
            client.close()
