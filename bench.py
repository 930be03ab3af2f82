"""Benchmark: Atari-shaped V-trace env-frames/s per chip.

Measures the fused on-device rollout+train loop (conv + LSTM policy over
84x84 uint8 frames, the workload class of BASELINE.md's primary metric) on
one chip and prints one JSON line.

Baseline anchor: the TF2 reference publishes no throughput table
(BASELINE.md); the SEED paper (arXiv:1910.06591, linked from the reference
README) reports ~2.4M env fps on 64 TPUv3 cores for DmLab-class conv+LSTM
agents ≈ 37.5k env-frames/s per core. We use 40k frames/s/chip as the
reference-per-chip anchor; vs_baseline = measured / anchor. The BASELINE.md
target is vs_baseline >= 5.
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.agents import vtrace as vtrace_agent
from seed_rl_tpu.envs import BatchedEnv
from seed_rl_tpu.envs.synthetic import SyntheticAtariEnv
from seed_rl_tpu.models.atari import AtariPolicyNet
from seed_rl_tpu.rollout import RolloutEngine

BASELINE_FRAMES_PER_SEC_PER_CHIP = 40_000.0


def build_learner(num_envs: int, unroll_length: int):
    num_actions = 18
    env = BatchedEnv(SyntheticAtariEnv(num_actions=num_actions), num_envs)
    dist = pd.CategoricalDistribution(num_actions)
    net = AtariPolicyNet(
        parametric_distribution_param_size=dist.param_size,
        stack_size=4,
        lstm_size=256,
        dtype=jnp.bfloat16,
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length)
    return vtrace_agent.VTraceLearner(
        engine,
        agent,
        vtrace_agent.VTraceConfig(),
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )


def main():
    num_envs = 1024
    unroll_length = 32
    steps_per_call = 2

    learner = build_learner(num_envs, unroll_length)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    # Donating the train state keeps rollout/optimizer buffers in place
    # across steps (no copy-on-write of the env/replay state).
    run = jax.jit(
        lambda s: learner.train_many(s, steps_per_call), donate_argnums=0
    )

    # Warmup: compile + one measured-shape execution.
    state, _ = run(state)
    jax.block_until_ready(state.step)

    calls = 8
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = run(state)
    jax.block_until_ready(state.step)
    dt = time.perf_counter() - t0

    frames = calls * steps_per_call * num_envs * unroll_length
    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": "vtrace_atari_env_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
