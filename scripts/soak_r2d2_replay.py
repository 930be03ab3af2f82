"""Reference-scale soak of the host R2D2 data plane.

Proves — by measurement, not assertion — that the reference's cloud R2D2
replay configuration fits and sustains on one learner host: a 100k-unroll
host-RAM buffer (unroll 80 + burn-in 40 + bootstrap = 121 timesteps of
84x84 uint8 frames per item, ~86 GB; /root/reference/gcp/train_atari.sh:
28-33 notes the reference needs a >104 GB-RAM master for the same config),
filled and then driven through the sustained insert -> prioritized-sample
-> train -> priority-write-back cycle of ``host_offpolicy_loop`` at the
reference's replay_ratio 0.75 (insertion_batch = batch 64 / 0.75 ≈ 85,
agents/r2d2/learner.py:113-117).

Synthetic unrolls stand in for env stepping (the env half is measured
separately by bench.py / the pipelined host loop) so the numbers isolate
the replay data plane: host ring insert, categorical sample + host gather
+ H2D (with the prefetch thread overlapping the in-flight device step),
jitted train on the full DuelingLSTMDQNNet, and priority write-back.

Run:  python scripts/soak_r2d2_replay.py                 # full 100k scale
      python scripts/soak_r2d2_replay.py --buffer_size=2000 --seconds=10

Prints one JSON line: steady-state frames/s, train batches/s, RSS.
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def make_synthetic_unroll(agent, batch, t_total, frame_shape, num_actions,
                          rng):
    """Time-major [T, B] Unroll with realistic dtypes/shapes."""
    from seed_rl_tpu.rollout import Timestep, Unroll
    from seed_rl_tpu.types import EnvOutput, QAgentOutput

    h, w = frame_shape
    k1, k2, k3 = jax.random.split(rng, 3)
    env_output = EnvOutput(
        reward=jnp.zeros((t_total, batch), jnp.float32),
        done=jnp.zeros((t_total, batch), bool),
        observation=jax.random.randint(
            k1, (t_total, batch, h, w, 1), 0, 255, dtype=jnp.int32
        ).astype(jnp.uint8),
        abandoned=jnp.zeros((t_total, batch), bool),
        episode_step=jnp.tile(
            jnp.arange(t_total, dtype=jnp.int32)[:, None], (1, batch)
        ),
    )
    actions = jax.random.randint(
        k2, (t_total, batch), 0, num_actions, dtype=jnp.int32
    )
    agent_output = QAgentOutput(
        action=actions,
        q_values=jax.random.normal(
            k3, (t_total, batch, num_actions), jnp.float32
        ),
    )
    return Unroll(
        agent_state=agent.initial_state(batch),
        timesteps=Timestep(
            prev_action=jnp.roll(actions, 1, axis=0),
            env_output=env_output,
            agent_output=agent_output,
        ),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--buffer_size", type=int, default=100_000,
                   help="reference gcp/train_atari.sh: 100000 unrolls")
    p.add_argument("--unroll_length", type=int, default=80)
    p.add_argument("--burn_in", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--replay_ratio", type=float, default=0.75)
    p.add_argument("--num_actions", type=int, default=18)
    p.add_argument("--lstm_size", type=int, default=512)
    p.add_argument("--seconds", type=float, default=120.0,
                   help="sustained-phase duration")
    p.add_argument("--fill_report_every", type=int, default=200)
    args = p.parse_args(argv)

    from seed_rl_tpu.agents import r2d2
    from seed_rl_tpu.models.atari import DuelingLSTMDQNNet
    from seed_rl_tpu.replay_host import HostReplayBuffer

    insertion_batch = max(
        1, int(round(args.batch_size / args.replay_ratio))
    )
    t_total = args.burn_in + args.unroll_length + 1
    frame_shape = (84, 84)

    net = DuelingLSTMDQNNet(
        num_actions=args.num_actions, lstm_size=args.lstm_size
    )
    agent = r2d2.R2D2Agent(
        net, r2d2.training_env_epsilons(insertion_batch)
    )
    config = r2d2.R2D2Config(
        burn_in=args.burn_in,
        n_steps=5,
        batch_size=args.batch_size,
        replay_buffer_size=args.buffer_size,
        replay_buffer_min_size=args.buffer_size,
        update_target_every_n_step=2500,
        num_eval_envs=0,
    )
    learner = r2d2.R2D2HostLearner(
        agent,
        config,
        optax.chain(optax.clip_by_global_norm(80.0), optax.adam(1e-4)),
        insertion_batch,
        args.unroll_length,
    )
    replay = HostReplayBuffer(
        args.buffer_size, config.importance_sampling_exponent
    )

    rng = jax.random.PRNGKey(0)
    unroll = make_synthetic_unroll(
        agent, insertion_batch, t_total, frame_shape, args.num_actions,
        jax.random.PRNGKey(7),
    )
    state = jax.jit(learner.init)(
        rng,
        unroll.timesteps.prev_action[0],
        jax.tree.map(lambda x: x[0], unroll.timesteps.env_output),
    )
    make_items = jax.jit(learner.make_items_and_priorities)
    train = jax.jit(learner.train_on_batch)

    items, priorities = jax.block_until_ready(make_items(unroll))
    # Host-resident once: in production the per-cycle D2H of fresh items
    # rides PCIe; through this box's network-tunneled TPU it would dominate
    # and measure the tunnel, not the data plane under test.
    items = jax.tree.map(np.asarray, items)
    priorities = np.asarray(priorities)
    item_bytes = sum(
        np.asarray(l[0]).nbytes for l in jax.tree.leaves(items)
    )
    print(
        f"soak: item={item_bytes/2**20:.2f} MiB, buffer target "
        f"{args.buffer_size * item_bytes / 2**30:.1f} GiB, "
        f"insertion_batch={insertion_batch}, T={t_total}",
        flush=True,
    )

    # Phase 1: fill to capacity (measures ring-insert throughput + RAM).
    fill_t0 = time.perf_counter()
    cycles = 0
    while replay.num_inserted < args.buffer_size:
        replay.insert(items, priorities)
        cycles += 1
        if cycles % args.fill_report_every == 0:
            dt = time.perf_counter() - fill_t0
            done_frac = replay.num_inserted / args.buffer_size
            print(
                f"fill: {replay.num_inserted}/{args.buffer_size} "
                f"({100*done_frac:.0f}%), {replay.nbytes()/2**30:.1f} GiB, "
                f"rss={_rss_gb():.1f} GiB, "
                f"{replay.num_inserted*args.unroll_length/dt:.0f} frames/s",
                flush=True,
            )
    fill_secs = time.perf_counter() - fill_t0
    fill_gib = replay.nbytes() / 2**30

    # Warm the train step's compile outside the measured window.
    indices, weights, items_b = replay.sample(
        args.batch_size, config.priority_exponent
    )
    state, new_priorities, _ = train(state, items_b, jnp.asarray(weights))
    jax.block_until_ready(new_priorities)
    replay.update_priorities(indices, np.asarray(new_priorities))

    # Phase 2: sustained insert+sample+train at replay_ratio (the
    # host_offpolicy_loop hot cycle, prefetch overlapping the device step).
    owed = 0.0
    train_batches = 0
    sustained_frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        replay.insert(items, priorities)
        sustained_frames += insertion_batch * args.unroll_length
        owed += args.replay_ratio * insertion_batch / args.batch_size
        while owed >= 1.0:
            owed -= 1.0
            if replay._prefetch_thread is None:
                replay.sample_async(
                    args.batch_size, config.priority_exponent
                )
            indices, weights, items_b = replay.wait_sample()
            state, new_priorities, _ = train(
                state, items_b, jnp.asarray(weights)
            )
            if owed >= 1.0:
                replay.sample_async(
                    args.batch_size, config.priority_exponent
                )
            replay.update_priorities(indices, np.asarray(new_priorities))
            train_batches += 1
    sustained_secs = time.perf_counter() - t0
    jax.block_until_ready(state.params)

    # H2D bandwidth probe: on a network-tunneled TPU (this dev box) the
    # host->device copy of sampled batches dominates the sustained cycle;
    # on a PCIe/host-attached chip it is >100x faster. Reporting it makes
    # the sustained number interpretable across environments.
    #
    # Dtype-parity probe: the reference packs sampled uint8 4->uint32
    # before infeed because TF's TPU transfer inflated uint8 to int32
    # (tpu_encode, /root/reference/common/utils.py:884-944). On a PJRT
    # path bytes are transferred 1:1 regardless of dtype, so the packing
    # is a no-op — measured here (round 4): uint8, bitcast-uint32 and
    # float32 of equal byte count move at equal MB/s. The host-fed
    # sample path therefore has no packing lever; its levers are overlap
    # (the prefetch thread, in place) and hardware attachment.
    # NOTE: sync via block_until_ready, which does block for device_put
    # transfer futures (it is jitted *execution* the relay fails to block
    # on); a jitted-reduction sync here would AOT-compile one tiny program
    # per distinct shape (~20 s each through the remote compile helper)
    # and measure the compiler, not the copy.
    def _h2d_probe(arr, reps=2):
        jax.device_put(arr).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.device_put(arr).block_until_ready()
        return arr.nbytes / 2**20 / ((time.perf_counter() - t0) / reps)

    probe_u8 = np.random.randint(0, 256, (16 << 20,), np.uint8)
    h2d_mbps = _h2d_probe(probe_u8)
    h2d_mbps_u32 = _h2d_probe(probe_u8.view(np.uint32))
    h2d_mbps_f32 = _h2d_probe(
        np.random.rand(4 << 20).astype(np.float32)
    )

    # Per-stage decomposition of one sustained cycle (grounds the
    # host-attached-chip projection in component measurements).
    t0 = time.perf_counter()
    replay.insert(items, priorities)
    stage_insert_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    with replay._lock:
        idx_d, w_d, gathered_d = replay._sample_host(
            args.batch_size, config.priority_exponent
        )
    stage_gather_ms = (time.perf_counter() - t0) * 1e3
    batch_mb = sum(g.nbytes for g in gathered_d) / 2**20
    for g in gathered_d:  # warm the per-shape transfer path
        jax.device_put(g).block_until_ready()
    t0 = time.perf_counter()
    put = [jax.device_put(g) for g in gathered_d]
    for x in put:
        x.block_until_ready()
    stage_h2d_ms = (time.perf_counter() - t0) * 1e3
    items_d = jax.tree_util.tree_unflatten(replay._treedef, put)
    state, new_priorities, _ = train(state, items_d, jnp.asarray(w_d))
    t0 = time.perf_counter()
    _ = np.asarray(new_priorities)
    stage_train_ms = (time.perf_counter() - t0) * 1e3

    result = {
        "metric": "r2d2_host_replay_soak",
        "buffer_unrolls": args.buffer_size,
        "buffer_gib": round(fill_gib, 2),
        "h2d_mbps": round(h2d_mbps, 1),
        "h2d_mbps_packed_u32": round(h2d_mbps_u32, 1),
        "h2d_mbps_f32": round(h2d_mbps_f32, 1),
        "stage_ms": {
            "insert": round(stage_insert_ms, 1),
            "sample_gather": round(stage_gather_ms, 1),
            "h2d": round(stage_h2d_ms, 1),
            "train_wait": round(stage_train_ms, 1),
            "batch_mb": round(batch_mb, 1),
        },
        "rss_gib": round(_rss_gb(), 2),
        "fill_frames_per_sec": round(
            args.buffer_size * args.unroll_length / fill_secs, 1
        ),
        "sustained_env_frames_per_sec": round(
            sustained_frames / sustained_secs, 1
        ),
        "train_batches_per_sec": round(train_batches / sustained_secs, 2),
        "sustained_secs": round(sustained_secs, 1),
        "device": jax.devices()[0].platform,
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
