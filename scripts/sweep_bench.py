"""Sweep bench.py configurations on the real chip; prints fps per config."""

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def measure(num_envs, unroll_length, steps_per_call, calls=6):
    learner = bench.build_learner(num_envs, unroll_length)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    run = jax.jit(
        lambda s: learner.train_many(s, steps_per_call), donate_argnums=0
    )
    state, _ = run(state)
    jax.block_until_ready(state.step)
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = run(state)
    jax.block_until_ready(state.step)
    dt = time.perf_counter() - t0
    frames = calls * steps_per_call * num_envs * unroll_length
    fps = frames / dt
    print(
        f"envs={num_envs:5d} unroll={unroll_length:3d} spc={steps_per_call} "
        f"-> {fps / 1e3:7.1f}k fps",
        flush=True,
    )
    return fps


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        envs, unroll, spc = (int(x) for x in spec.split(","))
        measure(envs, unroll, spc)
