"""R2D2 throughput at the reference cloud shape (gcp/train_atari.sh).

256 envs, unroll 80, burn-in 40, batch 64, prioritized replay + target net,
DuelingLSTMDQNNet on synthetic 84x84 Atari frames. Prints env-frames/s/chip.

Methodology: iterations chain through the donated train state; one host
fetch at the end (the axon relay does not reliably block in
block_until_ready and charges ~20ms per fetch round-trip).
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.agents import r2d2
from seed_rl_tpu.envs import BatchedEnv
from seed_rl_tpu.envs.synthetic import SyntheticAtariEnv
from seed_rl_tpu.models.atari import DuelingLSTMDQNNet
from seed_rl_tpu.rollout import RolloutEngine

NUM_ENVS = 256
UNROLL = 80
BURN_IN = 40


def main():
    num_actions = 18
    env = BatchedEnv(SyntheticAtariEnv(num_actions=num_actions), NUM_ENVS)
    net = DuelingLSTMDQNNet(num_actions=num_actions, core_dtype=jnp.bfloat16,
                            dtype=jnp.bfloat16)
    agent = r2d2.R2D2Agent(net, r2d2.training_env_epsilons(NUM_ENVS))
    engine = RolloutEngine(
        env, agent, UNROLL, num_overlapping_steps=BURN_IN
    )
    config = r2d2.R2D2Config(
        n_steps=5,
        burn_in=BURN_IN,
        replay_buffer_size=512,
        replay_buffer_min_size=8,
        batch_size=64,
        update_target_every_n_step=2500,
    )
    learner = r2d2.R2D2Learner(
        engine,
        agent,
        config,
        optax.chain(optax.clip_by_global_norm(80.0), optax.adam(1e-4)),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step, donate_argnums=0)
    while int(state.replay.num_inserted) < config.replay_buffer_min_size:
        state = warmup(state)
    run = jax.jit(lambda s: learner.train_many(s, 1), donate_argnums=0)
    state, _ = run(state)
    _ = int(state.step)

    calls = 8
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = run(state)
    _ = int(state.step)
    dt = time.perf_counter() - t0

    frames = calls * NUM_ENVS * UNROLL
    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": "r2d2_atari_env_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 40_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
