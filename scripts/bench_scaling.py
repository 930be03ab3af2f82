"""Weak-scaling efficiency harness: env-frames/s vs. replica count.

BASELINE.md's scale-out target is >=80% env-steps/s scaling efficiency from
1 host to N hosts (the reference never shipped a harness for this; its
multi-host path is exercised only implicitly through tf.distribute —
common/utils.py:53-116). This script measures it directly: the fused
rollout+train step runs as one global-array SPMD program over an n-replica
mesh (seed_rl_tpu.parallel.DistributedLearner), envs weak-scaled at a fixed
count per replica, and reports frames/s plus efficiency relative to the
1-replica run.

On real hardware the mesh spans chips/hosts (run under jax.distributed for
pods); with ``--virtual N`` it runs on N virtual CPU devices — that validates
the sharding/collective code path and measures SPMD partitioning overhead,
not ICI bandwidth.

Usage:
  python scripts/bench_scaling.py                      # real devices, 1..all
  python scripts/bench_scaling.py --virtual 8          # 8 virtual CPU devices
  python scripts/bench_scaling.py --model atari --envs_per_replica 256

Prints one line per replica count and a final JSON summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_virtual_cpu(n: int) -> None:
    # Reuse the guarded helper (stale-flag handling, backend-initialized
    # check, defensive try/except around private jax internals) instead of
    # duplicating unguarded pokes here.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import __graft_entry__

    __graft_entry__._ensure_virtual_cpu_mesh(n)


def build_learner(model: str, num_envs: int, unroll_length: int):
    import jax.numpy as jnp
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.envs import BatchedEnv, ToyEnv
    from seed_rl_tpu.rollout import RolloutEngine

    if model == "atari":
        from seed_rl_tpu.envs.synthetic import SyntheticAtariEnv
        from seed_rl_tpu.models.atari import AtariPolicyNet

        dist = pd.CategoricalDistribution(18)
        net = AtariPolicyNet(
            parametric_distribution_param_size=dist.param_size,
            stack_size=4,
            lstm_size=256,
            dtype=jnp.bfloat16,
        )
        env = BatchedEnv(SyntheticAtariEnv(num_actions=18), num_envs)
    else:
        from seed_rl_tpu.models import MLPPolicyNetwork

        dist = pd.NormalTanhDistribution(3)
        net = MLPPolicyNetwork(
            parametric_distribution_param_size=dist.param_size,
            mlp_sizes=(64, 64),
        )
        env = BatchedEnv(ToyEnv(horizon=20), num_envs)

    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length)
    return vtrace_agent.VTraceLearner(
        engine,
        agent,
        vtrace_agent.VTraceConfig(),
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )


def measure(model, n_replicas, envs_per_replica, unroll, steps_per_call, calls):
    import jax

    from seed_rl_tpu.parallel import DistributedLearner, make_mesh

    num_envs = envs_per_replica * n_replicas
    learner = build_learner(model, num_envs, unroll)
    mesh = make_mesh(
        num_replicas=n_replicas, devices=jax.devices()[:n_replicas]
    )
    dlearner = DistributedLearner(learner, mesh)
    state = dlearner.init(jax.random.PRNGKey(0))
    state, _ = dlearner.train_many(state, steps_per_call)  # warmup/compile
    jax.block_until_ready(state.step)
    t0 = time.perf_counter()
    for _ in range(calls):
        state, _ = dlearner.train_many(state, steps_per_call)
    jax.block_until_ready(state.step)
    dt = time.perf_counter() - t0
    frames = calls * steps_per_call * num_envs * unroll
    return frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", default=None,
                    help="comma list, e.g. 1,2,4,8 (default: 1..device_count "
                         "powers of two)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (code-path validation)")
    ap.add_argument("--model", default="mlp", choices=["mlp", "atari"])
    ap.add_argument("--envs_per_replica", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--steps_per_call", type=int, default=2)
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()

    if args.virtual:
        _force_virtual_cpu(args.virtual)
    import jax

    ndev = len(jax.devices())
    if args.replicas:
        # Sorted + deduped: efficiency is measured relative to the smallest
        # replica count, so an unsorted list like "8,1" must not pick 8 as
        # the baseline.
        replicas = sorted({int(x) for x in args.replicas.split(",")})
    else:
        replicas, n = [], 1
        while n <= ndev:
            replicas.append(n)
            n *= 2
    replicas = [n for n in replicas if n <= ndev]

    results = {}
    for n in replicas:
        fps = measure(
            args.model, n, args.envs_per_replica, args.unroll,
            args.steps_per_call, args.calls,
        )
        results[n] = fps
        base = results[replicas[0]] * (n / replicas[0])
        eff = fps / base
        print(
            f"replicas={n:3d} envs={args.envs_per_replica * n:6d} "
            f"-> {fps / 1e3:9.1f}k frames/s  efficiency={eff:6.1%}",
            flush=True,
        )

    n_max = replicas[-1]
    eff = results[n_max] / (results[replicas[0]] * n_max / replicas[0])
    summary = {
        "metric": f"scaling_efficiency_{replicas[0]}_to_{n_max}_replicas",
        "value": round(eff, 4),
        "unit": "fraction",
        "platform": jax.devices()[0].platform,
        "frames_per_sec": {str(k): round(v, 1) for k, v in results.items()},
    }
    if jax.devices()[0].platform == "cpu":
        summary["note"] = (
            "virtual CPU devices share one host's cores: this validates the "
            "SPMD code path, not hardware scaling — weak-scaling efficiency "
            "is only meaningful on real chips"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
