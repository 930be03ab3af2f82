"""Actor loop + learner-side inference bridge for external actors.

This reproduces the reference's full actor↔learner capability
(common/actor.py:45-185 + the learners' ``inference`` tf.functions, e.g.
agents/vtrace/learner.py:350-405) for environments that cannot be
vectorized on device:

- ``actor_loop``: steps one batched env group, calling
  ``client.inference(env_id, run_id, env_output, raw_reward) -> action``
  per step; generates a fresh random ``run_id`` per (re)start so the
  learner can detect restarts (actor.py:80-84); on transport errors it
  tears down and rebuilds env + client (actor.py:71-74, 182-185); the
  abandoned-episode protocol presents the final truncated transition as
  non-done so algorithms can bootstrap (actor.py:119-143).
- ``InferenceBridge``: the learner-side handler bound to the C++ batching
  server (runtime/inference_server.py). Per batch it: detects run_id
  changes and resets those envs' unroll/agent/action state (vtrace
  learner.py:352-366), drops stale duplicate requests from dying actors
  (``get_non_dying_envs``, common/utils.py:1005-1059), runs the jitted
  policy on the batch, scatters back recurrent state, accumulates
  timesteps into a ``HostUnrollStore`` and pushes completed unrolls into a
  queue for the learner's ``update``.
"""

import queue
import threading
from typing import Any, Callable, Optional

import numpy as np

from seed_rl_tpu.runtime.unroll_store import HostUnrollStore
from seed_rl_tpu.types import EnvOutput


def get_non_dying_envs(env_ids: np.ndarray, run_ids: np.ndarray):
    """Mask dropping in-flight stale requests of restarting envs.

    Mirrors common/utils.py:1005-1059: when the same env appears more than
    once in a batch (the old actor's last in-flight request racing its
    replacement's first one), only the most recent request survives; after
    filtering, each env appears exactly once. A *changed* run_id relative to
    the learner's stored one is a restart, handled separately (state reset)
    — it must NOT be dropped.
    """
    last = {}
    for i, env_id in enumerate(env_ids):
        last[int(env_id)] = i
    keep = np.zeros(len(env_ids), bool)
    for i in last.values():
        keep[i] = True
    assert len(last) == keep.sum()
    return keep


class InferenceBridge:
    """Builds the batch handler + unroll pipeline around a jitted policy."""

    def __init__(
        self,
        agent,
        params_fn: Callable[[], Any],
        num_envs: int,
        unroll_length: int,
        timestep_specs,
        num_overlapping_steps: int = 0,
        unroll_queue_max_size: int = 64,
        example_action=None,
        profile_inference_return=None,
        config=None,
        store_unrolls_on_inference: bool = True,
        evaluator=None,
        virtual_batch_size: int = 1,
        training_iterations_fn: Optional[Callable[[], int]] = None,
        on_unroll_lost: Optional[Callable] = None,
    ):
        import jax
        import jax.numpy as jnp

        # Example single-env action used to size the prev-action store
        # (defaults to a scalar int32, the discrete-agent case).
        self._example_action = (
            np.zeros((), np.int32) if example_action is None
            else np.asarray(example_action)
        )
        self.agent = agent
        self.params_fn = params_fn
        self.num_envs = num_envs
        self.store = HostUnrollStore(
            num_envs, unroll_length, timestep_specs, num_overlapping_steps
        )
        self.unroll_queue: "queue.Queue" = queue.Queue(unroll_queue_max_size)
        self.run_ids = np.zeros((num_envs,), np.int64)
        self._rng = jax.random.PRNGKey(np.random.randint(2**31))
        # Stage-isolating early return (reference --profile_inference_return,
        # agents/policy_gradient/learner_config.py:24-29). None == END.
        self.profile_inference_return = profile_inference_return
        # Learner-is-source-of-truth config pushed to actors at connect
        # (reference get_config RPC, ppo learner.py:1085-1092 +
        # utils.py:1093-1110). Any picklable value; typically the dict from
        # utils.config.serialize_config.
        self.config = config
        # PPO external-actor contract (reference agents/policy_gradient/
        # learner.py:908-1121): when store_unrolls_on_inference is False,
        # actors build unrolls locally and push them via add_unroll instead
        # of the learner-side store; add_stats feeds the Evaluator;
        # pending_minimize tells actors whether the learner still has
        # training work queued (backpressure for synchronous on-policy
        # operation).
        self.store_unrolls_on_inference = store_unrolls_on_inference
        self.evaluator = evaluator
        self.virtual_batch_size = max(int(virtual_batch_size), 1)
        self._training_iterations_fn = training_iterations_fn
        # Completed unrolls enqueued so far (either path); mirrors
        # host.completed_unrolls (reference learner.py:909-913).
        self.completed_unrolls = 0
        # Called with env ids whose in-flight episode data was lost (actor
        # restart resets, backpressure drops) so downstream episode
        # accounting can invalidate those envs until the next boundary.
        self.on_unroll_lost = on_unroll_lost

        # Dense per-env state (numpy mirrors of the reference Aggregators).
        # np.array (not asarray): device arrays view as read-only numpy.
        state0 = agent.initial_state(num_envs)
        self._agent_states = jax.tree.map(np.array, state0)
        self._initial_state_row = jax.tree.map(
            lambda x: np.array(x[:1]), state0
        )
        # Core state at the start of each env's current unroll
        # (first_agent_states aggregator, vtrace learner.py:333-340).
        self._unroll_first_states = jax.tree.map(
            np.copy, self._agent_states
        )
        self._prev_actions: Optional[np.ndarray] = None

        # Agents with per-env policy data (R2D2's epsilon ladder) take the
        # global env ids of the batch rows — inference batches are arbitrary
        # env subsets, so positional indexing would misassign epsilons.
        import inspect

        self._pass_env_ids = (
            "env_ids" in inspect.signature(agent.policy_step).parameters
        )

        def policy_step(params, prev_action, env_output, core_state, rng,
                        env_ids):
            rng, key = jax.random.split(rng)
            if self._pass_env_ids:
                out, state = agent.policy_step(
                    params, prev_action, env_output, core_state, key,
                    env_ids=env_ids,
                )
            else:
                out, state = agent.policy_step(
                    params, prev_action, env_output, core_state, key
                )
            return out, state, rng

        self._policy_step = jax.jit(policy_step)

    def get_config(self):
        return self.config

    def add_stats(self, data) -> None:
        """Actor-reported finished-episode stats → Evaluator.

        ``data`` is EpisodeInfo-shaped: (eval_name, episode_num_frames,
        episode_returns, episode_raw_returns). Reference learner.py:
        1095-1098 (host 0 only; here there is one bridge per host anyway).
        """
        if self.evaluator is not None:
            self.evaluator.add(data)

    def add_unroll(self, first_states, timesteps) -> None:
        """Actor-built unroll batch → unroll queue.

        Counterpart of the reference ``add_unroll`` RPC (learner.py:
        1100-1104, bound when store_unrolls_on_inference is False): the
        batch is unstacked into individual unrolls. ``first_states``
        leaves are [B, ...] core states; ``timesteps`` leaves are
        [B, T_total, ...] (item-major, like the store's output).
        """
        import jax

        batch = len(jax.tree.leaves(timesteps)[0])
        env_ids = np.arange(batch, dtype=np.int64)
        self.unroll_queue.put((env_ids, first_states, timesteps))
        self.completed_unrolls += batch

    def pending_minimize(self) -> bool:
        """True while training lags the collected unrolls.

        Reference learner.py:908-913: actors poll this to pace themselves
        against the learner (virtual_batch_size unrolls per training
        iteration).
        """
        if self._training_iterations_fn is None:
            return False
        return self._training_iterations_fn() < (
            self.completed_unrolls // self.virtual_batch_size
        )

    def _zero_actions(self, n):
        if self._prev_actions is not None:
            return (
                np.zeros(
                    (n,) + self._prev_actions.shape[1:],
                    self._prev_actions.dtype,
                ),
            )
        return (
            np.broadcast_to(
                np.zeros_like(self._example_action),
                (n,) + self._example_action.shape,
            ).copy(),
        )

    def handler(self, env_ids: np.ndarray, request):
        """InferenceServer handler: request = (run_id i64, EnvOutput)."""
        import jax

        from seed_rl_tpu.utils.profiling import InferenceReturn

        stage = self.profile_inference_return
        if stage == InferenceReturn.INSTANTLY:
            return self._zero_actions(len(env_ids))

        run_ids, env_output = request

        keep = get_non_dying_envs(env_ids, run_ids)
        # Detect restarted envs among the kept requests -> reset their rows.
        restarted = []
        for i in np.flatnonzero(keep):
            env_id = int(env_ids[i])
            if self.run_ids[env_id] != run_ids[i]:
                restarted.append(env_id)
                self.run_ids[env_id] = run_ids[i]
        if restarted:
            restarted = np.asarray(restarted)
            if self.on_unroll_lost is not None:
                self.on_unroll_lost(restarted)
            self.store.reset(restarted)
            for leaf, init in zip(
                jax.tree.leaves(self._agent_states),
                jax.tree.leaves(self._initial_state_row),
            ):
                leaf[restarted] = init[0]
            for leaf, init in zip(
                jax.tree.leaves(self._unroll_first_states),
                jax.tree.leaves(self._initial_state_row),
            ):
                leaf[restarted] = init[0]
            if self._prev_actions is not None:
                self._prev_actions[restarted] = 0

        kept_idx = np.flatnonzero(keep)
        kept_env_ids = env_ids[kept_idx]
        kept_output = jax.tree.map(lambda x: x[kept_idx], env_output)

        # Gather per-env recurrent state and previous actions.
        core_state = jax.tree.map(
            lambda x: x[kept_env_ids], self._agent_states
        )
        if self._prev_actions is None:
            # Lazily sized from the first response.
            prev_action = None
        else:
            prev_action = self._prev_actions[kept_env_ids]

        if stage == InferenceReturn.BEFORE_INFERENCE:
            return self._zero_actions(len(env_ids))

        params = self.params_fn()
        import jax.numpy as jnp

        if prev_action is None:
            prev_action = np.broadcast_to(
                self._example_action,
                (len(kept_env_ids),) + self._example_action.shape,
            ).copy()

        agent_output, new_state, self._rng = self._policy_step(
            params,
            jnp.asarray(prev_action),
            jax.tree.map(jnp.asarray, kept_output),
            core_state,
            self._rng,
            jnp.asarray(kept_env_ids, jnp.int32),
        )
        agent_output = jax.tree.map(np.asarray, agent_output)
        new_state = jax.tree.map(np.asarray, new_state)

        # Scatter back the state and the actions we played.
        for leaf, new in zip(
            jax.tree.leaves(self._agent_states), jax.tree.leaves(new_state)
        ):
            leaf[kept_env_ids] = new
        if self._prev_actions is None:
            self._prev_actions = np.zeros(
                (self.num_envs,) + agent_output.action.shape[1:],
                agent_output.action.dtype,
            )
        actions = agent_output.action
        old_prev_actions = (
            prev_action
            if isinstance(prev_action, np.ndarray)
            else np.asarray(prev_action)
        )

        if stage == InferenceReturn.AFTER_INFERENCE:
            self._prev_actions[kept_env_ids] = actions
            return self._zero_actions(len(env_ids))

        # Append to the unroll store: (prev_action, env_output, agent_output).
        # Storage can be switched off (eval mode / actor-built unrolls via
        # add_unroll — reference store_unrolls_on_inference,
        # learner_config.py:99 + run_eval learner.py:486-488).
        if not self.store_unrolls_on_inference:
            self._prev_actions[kept_env_ids] = actions
            full_actions = np.zeros(
                (len(env_ids),) + actions.shape[1:], actions.dtype
            )
            full_actions[kept_idx] = actions
            return (full_actions,)
        completed_ids, unrolls = self.store.append(
            kept_env_ids,
            (old_prev_actions, kept_output, agent_output),
        )
        self._prev_actions[kept_env_ids] = actions
        if stage == InferenceReturn.AFTER_UNROLL:
            return self._zero_actions(len(env_ids))
        if len(completed_ids):
            first_states = jax.tree.map(
                lambda x: x[completed_ids], self._unroll_first_states
            )
            try:
                self.unroll_queue.put_nowait(
                    (completed_ids, first_states, unrolls)
                )
                self.completed_unrolls += len(completed_ids)
            except queue.Full:
                # Drop under backpressure (off-policy tolerates this), but
                # tell episode accounting those rewards are gone.
                if self.on_unroll_lost is not None:
                    self.on_unroll_lost(completed_ids)
            # The next unroll of these envs starts at the carried boundary;
            # record the state entering it.
            for leaf, cur in zip(
                jax.tree.leaves(self._unroll_first_states),
                jax.tree.leaves(self._agent_states),
            ):
                leaf[completed_ids] = cur[completed_ids]

        # Dying requests get a zero action (their actors are being replaced).
        full_actions = np.zeros(
            (len(env_ids),) + actions.shape[1:], actions.dtype
        )
        full_actions[kept_idx] = actions
        return (full_actions,)

    def next_unroll_batch(
        self,
        batch_size: int,
        timeout: float = 10.0,
        with_env_ids: bool = False,
        training_only_below: Optional[int] = None,
        excluded_sink: Optional[Callable] = None,
    ):
        """Collects ``batch_size`` completed unrolls, stacked time-major.

        Returns an ``Unroll``-compatible (agent_state, timesteps) pair with
        leaves [T_total, batch, ...], ready for any learner's ``update``.
        Surplus unrolls are kept for the next call (like the reference's
        unroll queue). With ``with_env_ids`` the return is
        ``(env_ids i64[batch], Unroll)`` so off-policy learners can key
        episode accounting exactly by env. ``training_only_below=N``
        excludes eval-env unrolls (env_id >= N) from the batch (reference
        r2d2 learner.py:793-803 — eval experience is never stored); each
        excluded ``(env_id, first_state, item_major_timesteps)`` goes to
        ``excluded_sink`` for eval episode accounting.
        """
        import jax
        import jax.numpy as jnp

        from seed_rl_tpu.rollout import Timestep, Unroll

        if not hasattr(self, "_pending"):
            self._pending = []
        while len(self._pending) < batch_size:
            completed_ids, first_states, unrolls = self.unroll_queue.get(
                timeout=timeout
            )
            for j in range(len(completed_ids)):
                env_id = int(completed_ids[j])
                item = (
                    env_id,
                    jax.tree.map(lambda x: x[j], first_states),
                    jax.tree.map(lambda x: x[j], unrolls),
                )
                if (
                    training_only_below is not None
                    and env_id >= training_only_below
                ):
                    if excluded_sink is not None:
                        excluded_sink(*item)
                    continue
                self._pending.append(item)
        items = self._pending[:batch_size]
        self._pending = self._pending[batch_size:]

        state_tree = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0),
            *[s for _, s, _ in items],
        )
        # Item-major [batch, T, ...] -> time-major [T, batch, ...].
        stacked = jax.tree.map(
            lambda *xs: jnp.swapaxes(
                jnp.stack([jnp.asarray(x) for x in xs], axis=0), 0, 1
            ),
            *[u for _, _, u in items],
        )
        prev_actions, env_outputs, agent_outputs = stacked
        unroll = Unroll(
            agent_state=state_tree,
            timesteps=Timestep(
                prev_action=prev_actions,
                env_output=env_outputs,
                agent_output=agent_outputs,
            ),
        )
        if with_env_ids:
            env_ids = np.asarray([e for e, _, _ in items], np.int64)
            return env_ids, unroll
        return unroll


def actor_loop(
    create_env_fn: Callable[[], Any],
    client,
    num_steps: Optional[int] = None,
    env_id_offset: int = 0,
    max_reconnects: int = 10,
    timer_export_fn=None,
    apply_config_fn=None,
    client_factory=None,
    inference_threads: Optional[int] = None,
):
    """Steps a HostBatchedEnv group against an inference client.

    ``client.inference(env_id, run_id, env_output_row, raw_reward) ->
    action``; batching happens server-side. One random int64 run_id per
    process life (regenerated on reconnect). When ``timer_export_fn`` is
    set, windowed-average wall-clock timings are exported as
    ``actor/elapsed_inference_s`` / ``actor/elapsed_env_step_s`` /
    ``actor/elapsed_env_reset_s`` (reference common/actor.py:100-110 +
    profiling.py:42-76).

    Per-env calls are issued CONCURRENTLY from a thread pool
    (``inference_threads``; default = num_envs, 0/1 = the reference's
    serial loop). The reference's actor blocks one call at a time on its
    mutex-serialized stream (common/actor.py:108 + grpc.cc:1061-1074), so
    a single reference actor can never fill a server batch by itself —
    every env then pays the batcher's flush timeout, and a small fleet
    runs at flush-timeout speed (measured: 8 serial envs against a
    batch-4/50 ms learner = 19 fps; concurrent calls remove the stall).
    Semantics are unchanged: each env independently blocks on its own
    action. Socket clients are one-connection-one-call, so concurrent
    mode needs ``client_factory`` to open one connection per pool thread;
    in-process clients (BridgeClient) are concurrency-safe as-is.
    """
    import concurrent.futures as _futures
    import threading as _threading

    from seed_rl_tpu.utils.profiling import ExportingTimer

    inference_timer = ExportingTimer(
        "actor/elapsed_inference_s", 100, timer_export_fn
    )
    env_step_timer = ExportingTimer(
        "actor/elapsed_env_step_s", 100, timer_export_fn
    )
    env_reset_timer = ExportingTimer(
        "actor/elapsed_env_reset_s", 1, timer_export_fn
    )
    reconnects = 0
    steps_done = 0
    while True:
        pool = None
        tls = _threading.local()
        made_clients = []
        try:
            # Adopt the learner's pushed config before building envs
            # (reference update_config at actor.py:75).
            if apply_config_fn is not None and hasattr(client, "get_config"):
                pushed = client.get_config()
                if pushed is not None:
                    apply_config_fn(pushed)
            env = create_env_fn()
            run_id = np.random.randint(1, 2**62, dtype=np.int64)
            with env_reset_timer:
                output = env.reset()
            n = env.num_envs
            threads = n if inference_threads is None else inference_threads
            import jax

            def _thread_client():
                if client_factory is None:
                    return client
                c = getattr(tls, "client", None)
                if c is None:
                    c = tls.client = client_factory()
                    made_clients.append(c)
                return c

            def _call(i, out):
                row = jax.tree.map(lambda x: x[i], out)
                return np.asarray(
                    _thread_client().inference(
                        env_id_offset + i, run_id, row, row.reward
                    )
                )

            if threads > 1:
                pool = _futures.ThreadPoolExecutor(min(threads, n))

            while num_steps is None or steps_done < num_steps:
                with inference_timer:
                    if pool is not None:
                        actions = list(
                            pool.map(lambda i: _call(i, output), range(n))
                        )
                    else:
                        actions = [_call(i, output) for i in range(n)]
                with env_step_timer:
                    output = env.step(np.stack(actions))
                steps_done += 1
            env.close()
            return steps_done
        except RuntimeError:
            reconnects += 1
            if reconnects > max_reconnects:
                raise
            continue
        finally:
            # Every exit path (return, RuntimeError retry, transport
            # errors propagating to run_actor's reconnect loop) releases
            # the pool threads and the per-thread connections — leaking
            # them across reconnect iterations would pile up blocked
            # threads and open sockets.
            if pool is not None:
                # Join the workers before closing their clients: a worker
                # can still be blocked in a socket recv on its per-thread
                # client, and closing that socket from here would race it
                # (ADVICE r4). cancel_futures drops queued work; in-flight
                # calls finish or fail on their own transport error first.
                pool.shutdown(wait=True, cancel_futures=True)
            for c in made_clients:
                try:
                    c.close()
                except Exception:
                    pass


class BridgeClient:
    """Adapts InferenceServer to the reference actor call convention."""

    def __init__(self, server, bridge=None):
        self._server = server
        self._bridge = bridge

    def inference(self, env_id, run_id, env_output, raw_reward):
        del raw_reward  # tracked learner-side via EnvOutput.reward
        (action,) = self._server.inference(
            env_id, (np.int64(run_id), env_output)
        )
        return action

    def get_config(self):
        """Fetch the learner's pushed config (reference get_config RPC)."""
        return self._bridge.get_config() if self._bridge is not None else None

    def add_stats(self, data):
        """Report a finished episode (reference add_stats RPC)."""
        if self._bridge is not None:
            self._bridge.add_stats(data)

    def add_unroll(self, first_states, timesteps):
        """Push an actor-built unroll batch (reference add_unroll RPC)."""
        if self._bridge is not None:
            self._bridge.add_unroll(first_states, timesteps)

    def pending_minimize(self):
        """Poll learner training backlog (reference pending_minimize RPC)."""
        return (
            self._bridge.pending_minimize()
            if self._bridge is not None
            else False
        )
