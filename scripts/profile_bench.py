"""Microbenchmark breakdown of the bench.py workload on the real chip.

NOTE on methodology: on the axon relay backend, ``jax.block_until_ready``
does not reliably force execution, and each host fetch costs a ~20ms tunnel
round-trip. Every measurement below therefore (a) chains iterations through
a scalar data dependency so none can be elided, and (b) forces exactly one
host fetch at the end; the per-iteration time amortizes the single RTT.
"""

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

NUM_ENVS = 1024
UNROLL = 32
FRAMES = NUM_ENVS * UNROLL


def timeit(name, chained_fn, c0, iters=20):
    """chained_fn: (carry_scalar) -> carry_scalar; times iters executions."""
    c = chained_fn(c0)
    _ = float(c)  # force compile + first execution
    t0 = time.perf_counter()
    for _ in range(iters):
        c = chained_fn(c)
    _ = float(c)  # single forced fetch
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:40s} {dt * 1e3:8.2f} ms  ({FRAMES / dt / 1e3:6.0f}k fps)",
        flush=True,
    )
    return dt


def main():
    num_actions = 18
    env = BatchedEnv(SyntheticAtariEnv(num_actions=num_actions), NUM_ENVS)
    dist = pd.CategoricalDistribution(num_actions)
    net = AtariPolicyNet(
        parametric_distribution_param_size=dist.param_size,
        stack_size=4,
        lstm_size=256,
        dtype=jnp.bfloat16,
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, UNROLL)
    config = vtrace_agent.VTraceConfig()
    learner = vtrace_agent.VTraceLearner(
        engine,
        agent,
        config,
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    step = jax.jit(
        lambda s, c: (lambda ns, m: (ns, c + m["losses/total"]))(
            *learner.train_step(s)
        )
    )

    def full_step(c):
        nonlocal state
        state, c = step(state, c)
        return c

    timeit("full train_step", full_step, jnp.float32(0))

    ro = jax.jit(
        lambda s, c: (
            lambda rs, u: c + u.timesteps.env_output.reward.sum()
        )(*engine.rollout(s.params["net"], s.rollout))
    )
    timeit("rollout only", ro_c := (lambda c: ro(state, c)), jnp.float32(0))

    _, unroll = jax.jit(
        lambda s: engine.rollout(s.params["net"], s.rollout)
    )(state)
    rng = jax.random.PRNGKey(1)

    loss_fn = lambda p, u: vtrace_agent.compute_loss(
        config, agent, dist, p, u, rng
    )[0]
    fwd = jax.jit(lambda p, u, c: loss_fn(p, u) + c)
    timeit("loss forward", lambda c: fwd(state.params, unroll, c),
           jnp.float32(0))

    grad = jax.jit(
        lambda p, u, c: jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32),
            jax.grad(loss_fn)(p, u),
            c,
        )
    )
    timeit("loss fwd+bwd", lambda c: grad(state.params, unroll, c),
           jnp.float32(0))


if __name__ == "__main__":
    main()
