"""Off-policy training driver: host envs + host-RAM replay + device train.

The rebuilt equivalent of the reference R2D2/SAC learner data-plane
(/root/reference/agents/r2d2/learner.py:387-468 create_dataset and
agents/sac/learner.py:478-530): inference-rate and train-rate are decoupled
through a host-resident replay buffer under the replay-ratio contract
(insertion_batch = batch_size / replay_ratio, r2d2 learner.py:113-117 —
i.e. each stored unroll is trained on ``replay_ratio`` times in
expectation), with the reference's three-thread discipline mapped to:

- driver thread: host env stepping (thread-pooled) + jitted policy
  inference (HostRolloutEngine), unroll -> items conversion + initial
  priorities on device, insert into host RAM;
- prefetch thread: categorical sampling + host gather + H2D of the next
  training batch, overlapped with the in-flight device train step;
- device: jitted train_on_batch; priorities stream back after dispatching
  the next batch (same staleness window as the reference's tf.data-thread
  sampling vs. main-loop priority updates, learner.py:435-437, 883-885).

Works with any learner exposing ``init(rng, prev_action, env_output)``,
``rollout_params(state)``, ``make_items_and_priorities(unroll)`` and
``train_on_batch(state, items, weights)`` — R2D2HostLearner and
SACHostLearner.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.replay_host import HostReplayBuffer
from seed_rl_tpu.utils import episode_stats


def host_offpolicy_loop(
    learner,
    host_engine,
    replay: HostReplayBuffer,
    rng,
    total_environment_frames: int,
    replay_ratio: float,
    replay_buffer_min_size: int,
    logger=None,
    checkpoint=None,
    log_every_cycles: int = 10,
    seed: int = 0,
    max_train_batches_per_cycle: Optional[int] = None,
    pipeline: bool = False,
    replay_dir: Optional[str] = None,
):
    """Returns the final device train state.

    ``replay_ratio``: expected times each stored item is trained on
    (reference r2d2 0.75, sac 4). Per rollout cycle the driver owes
    ``replay_ratio * inserted / batch_size`` optimization batches and keeps
    a fractional carry so non-integer ratios are honored exactly.

    With ``pipeline=True`` a background thread steps the host envs + policy
    inference for cycle k+1 while the driver trains on cycle k — the same
    decoupling the reference gets from its queue/tf.data threads (r2d2
    learner.py:435-437): behaviour params are one cycle stale (the rollout
    thread snapshots ``rollout_params`` at cycle start; off-policy losses
    consume the STORED behaviour outputs, so staleness only shifts the
    exploration policy, exactly as with the reference's remote actors).
    The handoff queue holds one unroll, bounding both staleness and wasted
    env frames at shutdown.
    """
    init_rng, rollout_rng = jax.random.split(rng)

    num_envs = host_engine.env.num_envs
    num_training = learner.num_training_envs
    env_output_np = host_engine.env.reset(seed=seed)
    env_output = jax.tree.map(jnp.asarray, env_output_np)
    prev_action = host_engine._batch_zero_action(num_envs)

    state = jax.jit(learner.init)(init_rng, prev_action, env_output)
    if checkpoint is not None:
        state = checkpoint.restore_or(state)
    if replay_dir is not None and replay.restore(replay_dir):
        print(
            f"Restored replay buffer from {replay_dir}: "
            f"{replay.num_inserted} items, "
            f"{replay.nbytes() / 2**30:.2f} GiB",
            flush=True,
        )

    host_state = host_engine.init(
        learner.rollout_params(state), rollout_rng, seed=seed
    )
    make_items = jax.jit(learner.make_items_and_priorities)
    train = jax.jit(learner.train_on_batch)
    on_unroll = None
    if hasattr(learner, "on_unroll"):
        on_unroll = jax.jit(learner.on_unroll)

    overlap = host_engine.overlap
    new_slice = overlap + 1  # timesteps [overlap+1:] are new each cycle

    def update_stats(stats, eval_stats, new_steps):
        train_steps = jax.tree.map(lambda x: x[:, :num_training], new_steps)
        stats = episode_stats.update(stats, train_steps)
        if num_envs > num_training:
            eval_steps = jax.tree.map(
                lambda x: x[:, num_training:], new_steps
            )
            eval_stats = episode_stats.update(eval_stats, eval_steps)
        return stats, eval_stats

    update_stats = jax.jit(update_stats)
    stats = episode_stats.init(num_training)
    eval_stats = episode_stats.init(max(num_envs - num_training, 1))

    owed = 0.0
    cycles = 0
    frames = 0
    pending = None  # (indices, dispatched train output) awaiting writeback
    window_logs = []
    priority_exp = getattr(learner, "priority_exponent", 0.0)
    batch_size = learner.batch_size
    rollout_wait_s = 0.0
    train_s = 0.0

    import queue as _queue
    import threading
    import time as _time

    rollout_q = None
    stop_rollouts = None
    rollout_thread = None
    worker_error = []
    params_holder = {"params": learner.rollout_params(state)}
    if pipeline:
        rollout_q = _queue.Queue(maxsize=1)
        stop_rollouts = threading.Event()

        def _rollout_worker():
            hs = host_state
            try:
                while not stop_rollouts.is_set():
                    hs, w_unroll = host_engine.rollout(
                        params_holder["params"], hs
                    )
                    while not stop_rollouts.is_set():
                        try:
                            rollout_q.put(w_unroll, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except BaseException as e:  # surface env/infra errors to driver
                worker_error.append(e)

        rollout_thread = threading.Thread(target=_rollout_worker,
                                          daemon=True)
        rollout_thread.start()

    def _next_pipelined_unroll():
        # Bounded waits so a dead worker raises its error instead of the
        # driver hanging forever on an empty queue.
        while True:
            try:
                return rollout_q.get(timeout=5.0)
            except _queue.Empty:
                if worker_error:
                    raise RuntimeError(
                        "pipelined rollout worker died"
                    ) from worker_error[0]
                if not rollout_thread.is_alive():
                    raise RuntimeError(
                        "pipelined rollout worker exited unexpectedly"
                    )

    while frames < total_environment_frames:
        t0 = _time.perf_counter()
        if pipeline:
            unroll = _next_pipelined_unroll()
        else:
            host_state, unroll = host_engine.rollout(
                params_holder["params"], host_state
            )
        rollout_wait_s += _time.perf_counter() - t0
        if on_unroll is not None:
            # Folds fresh observations into normalization stats (params
            # change without an optimizer step — refresh the snapshot).
            state = on_unroll(state, unroll)
            params_holder["params"] = learner.rollout_params(state)
        items, priorities = make_items(unroll)
        replay.insert(items, priorities)
        new_steps = jax.tree.map(
            lambda x: x[new_slice:], unroll.timesteps.env_output
        )
        stats, eval_stats = update_stats(stats, eval_stats, new_steps)
        cycles += 1
        frames += learner.frames_per_cycle

        if replay.num_inserted >= replay_buffer_min_size:
            t1 = _time.perf_counter()
            owed += replay_ratio * num_training / batch_size
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
                # Overlap the next batch's host gather + H2D with the
                # in-flight device step before blocking on its priorities.
                if k + 1 < budget:
                    replay.sample_async(batch_size, priority_exp)
                if priority_exp:
                    replay.update_priorities(
                        indices, np.asarray(new_priorities)
                    )
                window_logs.append(logs)
            if budget:
                params_holder["params"] = learner.rollout_params(state)
            train_s += _time.perf_counter() - t1

        if logger is not None and cycles % log_every_cycles == 0:
            metrics = {}
            if window_logs:
                stacked = jax.tree.map(
                    lambda *xs: float(np.mean([np.asarray(x) for x in xs])),
                    *window_logs,
                )
                metrics.update(stacked)
                window_logs = []
            # Windows accumulate until at least one episode completed (long
            # episodes vs. short log cadence would otherwise yield mostly
            # empty windows and no return curve).
            n = float(stats.num_episodes)
            if n > 0:
                metrics["episodes/mean_return"] = float(stats.sum_return) / n
                metrics["episodes/mean_length"] = float(stats.sum_length) / n
                stats = episode_stats.reset_window(stats)
            n_eval = float(eval_stats.num_episodes)
            if n_eval > 0:
                metrics["eval_episodes/mean_return"] = (
                    float(eval_stats.sum_return) / n_eval
                )
                metrics["eval_episodes/mean_length"] = (
                    float(eval_stats.sum_length) / n_eval
                )
                eval_stats = episode_stats.reset_window(eval_stats)
            metrics["replay/num_inserted"] = replay.num_inserted
            metrics["replay/ram_gb"] = round(replay.nbytes() / 2**30, 3)
            # Driver wall-time split: with pipeline=True, rollout_wait is
            # time the device sat idle waiting for env data (the pipelining
            # target metric); train is the device-busy span.
            metrics["time/rollout_wait_s"] = round(rollout_wait_s, 4)
            metrics["time/train_s"] = round(train_s, 4)
            rollout_wait_s = 0.0
            train_s = 0.0
            logger.log(int(state.step), metrics, frames=frames)
        if checkpoint is not None:
            # Replay snapshots ride the checkpoint cadence so a restart
            # resumes with BOTH the params and the experience that produced
            # them (the reference loses its RAM buffer on restart,
            # gcp/train_atari.sh:28-33 — measured round 3 to knock a
            # breakout curve back to its plateau).
            if checkpoint.maybe_save(int(state.step), state):
                if replay_dir is not None:
                    replay.save(replay_dir)

    if rollout_thread is not None:
        stop_rollouts.set()
        # Unblock a producer stuck on a full queue.
        try:
            rollout_q.get_nowait()
        except _queue.Empty:
            pass
        rollout_thread.join(timeout=30)
    if checkpoint is not None:
        checkpoint.maybe_save(int(state.step), state, force=True)
        if replay_dir is not None:
            replay.save(replay_dir)
    return state
