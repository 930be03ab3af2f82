"""GFootball-resnet V-trace throughput on synthetic packed SMM frames.

The reference's Football agent consumes bit-packed SMM observations
(72x96x4 bool planes packed to [72,96,1] uint16 on the wire,
/root/reference/football/observation.py:22-63) and unpacks them on
device; this measures that full path — device unpackbits + the 4-stack
GFootball resnet (football/networks.py:66-150 class) + V-trace — on one
chip. Round-4 measurement: ~70k env-frames/s/chip at 256 envs, flat to
512 (compute-bound; same channel-narrow-resnet class as ImpalaDeep's
72k). Not part of bench.py's driver run to bound its wall time.

Usage: python scripts/bench_football.py [num_envs] [unroll]
"""

import sys
import time
from typing import NamedTuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

from seed_rl_tpu import distributions as pd  # noqa: E402
from seed_rl_tpu.agent import PolicyAgent  # noqa: E402
from seed_rl_tpu.agents import vtrace as vtrace_agent  # noqa: E402
from seed_rl_tpu.envs.core import (  # noqa: E402
    BatchedEnv,
    JaxEnv,
    StepResult,
)
from seed_rl_tpu.models.resnets import GFootball  # noqa: E402
from seed_rl_tpu.rollout import RolloutEngine  # noqa: E402


class _S(NamedTuple):
    t: jnp.ndarray
    seed: jnp.ndarray


class SynthFootballEnv(JaxEnv):
    """SMM-shaped packed uint16 frames at negligible env cost."""

    num_actions = 19

    def __init__(self):
        self._space = gym.spaces.Discrete(self.num_actions)

    def observation_spec(self):
        return jax.ShapeDtypeStruct((72, 96, 1), jnp.uint16)

    @property
    def action_space(self):
        return self._space

    def _obs(self, s):
        r = jax.lax.broadcasted_iota(jnp.int32, (72, 96, 1), 0)
        return ((r + s.t + s.seed) % 65535).astype(jnp.uint16)

    def reset(self, rng):
        seed = jax.random.randint(rng, (), 0, 1000)
        s = _S(jnp.zeros((), jnp.int32), seed)
        return s, self._obs(s)

    def step(self, s, a):
        t = s.t + 1
        ns = _S(t, s.seed)
        return StepResult(
            ns,
            self._obs(ns),
            (a == s.seed % self.num_actions).astype(jnp.float32),
            t >= 500,
            jnp.zeros((), bool),
        )


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    env = BatchedEnv(SynthFootballEnv(), num_envs)
    dist = pd.CategoricalDistribution(19)
    net = GFootball(
        parametric_distribution_param_size=dist.param_size,
        dtype=jnp.bfloat16,
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(),
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    run = jax.jit(lambda s: learner.train_many(s, 1), donate_argnums=0)
    state, _ = run(state)
    float(jnp.sum(jax.tree.leaves(state)[0]) * 0 + 1)
    t0 = time.perf_counter()
    for _ in range(8):
        state, _ = run(state)
    float(jnp.sum(jax.tree.leaves(state)[0]) * 0 + 1)
    dt = (time.perf_counter() - t0) / 8
    print(
        f"football_vtrace_env_frames_per_sec_per_chip: "
        f"{num_envs * unroll / dt:,.0f} ({dt * 1e3:.0f} ms/step)"
    )


if __name__ == "__main__":
    main()
