"""Decomposition of the conv-PPO bench step (VERDICT r3 item #1).

Measures, at the exact bench.py::bench_ppo_atari shapes (256 envs, unroll
32, AtariPolicyNet conv+LSTM-256, shuffle mode, 2 epochs x 8 minibatches),
where the 203k-fps step spends its time:

  - full train_step (rollout + update)
  - rollout only
  - update only (epochs on a fixed unroll), per batch mode
  - one fwd+bwd over the whole batch (1 epoch x 1 minibatch, repeat)
  - the shuffle-mode minibatch gather in isolation (the round-3 replay
    layout-pathology class: jnp.take on a [T+1, B, 84, 84] uint8 tensor
    feeding a conv consumer)

Methodology identical to scripts/profile_bench.py: chain iterations
through a scalar data dependency, one forced host fetch per measurement
(the axon relay does not reliably block in block_until_ready).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agent import PolicyAgent
from seed_rl_tpu.agents.ppo import policy_losses
from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
    GeneralizedOnPolicyLoss,
)
from seed_rl_tpu.agents.ppo.learner import PPOConfig, PPOLearner
from seed_rl_tpu.agents.ppo.policy_regularizers import KLPolicyRegularizer
from seed_rl_tpu.envs import BatchedEnv
from seed_rl_tpu.envs.synthetic import SyntheticAtariEnv
from seed_rl_tpu.models.atari import AtariPolicyNet
from seed_rl_tpu.ops.advantages import GAE
from seed_rl_tpu.ops.popart import PopArt
from seed_rl_tpu.ops.running_statistics import AverageMeanStd
from seed_rl_tpu.rollout import RolloutEngine

# 256 envs = the shape of the published round-4 decomposition table
# (RESULTS.md). bench.py's conv-PPO line later moved to its measured
# 512-env optimum; override PPO_PROFILE_ENVS to decompose that shape.
import os as _os

NUM_ENVS = int(_os.environ.get("PPO_PROFILE_ENVS", "256"))
UNROLL = 32
FRAMES = NUM_ENVS * UNROLL


def timeit(name, chained_fn, c0, iters=20):
    c = chained_fn(c0)
    _ = float(c)  # compile + first execution
    t0 = time.perf_counter()
    for _ in range(iters):
        c = chained_fn(c)
    _ = float(c)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:44s} {dt * 1e3:8.2f} ms  ({FRAMES / dt / 1e3:6.0f}k fps)",
        flush=True,
    )
    return dt


def make_learner(batch_mode, epochs, batches):
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
    loss = GeneralizedOnPolicyLoss(
        agent=agent,
        reward_normalizer=PopArt(AverageMeanStd(), compensate=False),
        parametric_action_distribution=dist,
        advantage_estimator=GAE(lambda_=0.95),
        policy_loss=policy_losses.ppo(epsilon=0.2),
        discount_factor=0.99,
        regularizer=KLPolicyRegularizer(entropy=0.01),
        baseline_cost=1.0,
    )
    engine = RolloutEngine(env, agent, UNROLL)
    config = PPOConfig(
        epochs_per_step=epochs,
        batch_mode=batch_mode,
        batches_per_step=batches,
    )
    learner = PPOLearner(
        engine, agent, loss, config,
        optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4)),
    )
    return learner, engine


def main():
    learner, engine = make_learner("shuffle", epochs=2, batches=8)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    # 1. Full train step at bench shape.
    step = jax.jit(
        lambda s, c: (lambda ns, m: (ns, c + m["grad/norm"]))(
            *learner.train_step(s)
        )
    )

    def full_step(c):
        nonlocal state
        state, c = step(state, c)
        return c

    t_full = timeit("full step (shuffle 2ep x 8mb)", full_step,
                    jnp.float32(0))

    # 2. Rollout only.
    ro = jax.jit(
        lambda s, c: (
            lambda rs, u: c + u.timesteps.env_output.reward.sum()
        )(*engine.rollout(s.params["net"], s.rollout))
    )
    t_ro = timeit("rollout only", lambda c: ro(state, c), jnp.float32(0))

    # Fixed unroll for update-only measurements.
    _, unroll = jax.jit(
        lambda s: engine.rollout(s.params["net"], s.rollout)
    )(state)
    rng = jax.random.PRNGKey(1)

    def update_only(lrn):
        upd = jax.jit(
            lambda s, u, c: (lambda ns, m: (ns, c + m["grad/norm"]))(
                *lrn.update(s, u, rng)
            )
        )
        holder = {"s": state}

        def run(c):
            holder["s"], c = upd(holder["s"], unroll, c)
            return c

        return run

    # 3. Update only (epochs on fixed unroll) per mode.
    t_upd = timeit("update only (shuffle 2ep x 8mb)",
                   update_only(learner), jnp.float32(0))

    repeat_l, _ = make_learner("repeat", epochs=2, batches=8)
    t_rep = timeit("update only (repeat 2ep x 8mb, no gather)",
                   update_only(repeat_l), jnp.float32(0))

    one_l, _ = make_learner("repeat", epochs=1, batches=1)
    t_one = timeit("update only (repeat 1ep x 1mb = 1 fwd+bwd)",
                   update_only(one_l), jnp.float32(0))

    one8_l, _ = make_learner("repeat", epochs=1, batches=8)
    timeit("update only (repeat 1ep x 8mb)",
           update_only(one8_l), jnp.float32(0))

    # 4. The shuffle gather in isolation: 16 gathers (2ep x 8mb) of
    # [33, 32, ...] minibatches out of the [33, 256, 84, 84] uint8 obs +
    # the small leaves, chained like the epoch scan does.
    ts = unroll.timesteps
    data = (ts.prev_action, ts.env_output, ts.agent_output)

    def gathers(c, rng_):
        def body(carry, k):
            c_, r = carry
            r, pr = jax.random.split(r)
            idx = jax.random.permutation(pr, NUM_ENVS).reshape(8, 32)

            def mb(c2, i):
                g = jax.tree.map(lambda t: jnp.take(t, i, axis=1), data)
                return c2 + g[1].observation.astype(jnp.float32).sum(), None

            c_, _ = jax.lax.scan(mb, c_, idx)
            return (c_, r), None

        (c, _), _ = jax.lax.scan(body, (c, rng_), jnp.arange(2))
        return c

    g = jax.jit(gathers)
    timeit("16 minibatch gathers (take axis=1)",
           lambda c: g(c, jax.random.PRNGKey(2)), jnp.float32(0))

    # 5. Same gathers with the obs flattened to [T+1, B, 84*84] first
    # (layout-neutral trailing dim — the round-3 replay fix pattern).
    flat_obs = ts.env_output.observation.reshape(33, NUM_ENVS, -1)
    fdata = (ts.prev_action, flat_obs, ts.agent_output)

    def gathers_flat(c, rng_):
        def body(carry, k):
            c_, r = carry
            r, pr = jax.random.split(r)
            idx = jax.random.permutation(pr, NUM_ENVS).reshape(8, 32)

            def mb(c2, i):
                g = jax.tree.map(lambda t: jnp.take(t, i, axis=1), fdata)
                obs = g[1].reshape(33, 32, 84, 84)
                return c2 + obs.astype(jnp.float32).sum(), None

            c_, _ = jax.lax.scan(mb, c_, idx)
            return (c_, r), None

        (c, _), _ = jax.lax.scan(body, (c, rng_), jnp.arange(2))
        return c

    gf = jax.jit(gathers_flat)
    timeit("16 minibatch gathers (flattened obs)",
           lambda c: gf(c, jax.random.PRNGKey(2)), jnp.float32(0))

    print("-" * 60)
    print(f"decomposition: rollout {t_ro*1e3:.1f} + update {t_upd*1e3:.1f} "
          f"vs full {t_full*1e3:.1f} ms")
    print(f"shuffle-vs-repeat update delta (gather cost): "
          f"{(t_upd - t_rep)*1e3:.1f} ms")
    print(f"epoch scaling: 1x1 {t_one*1e3:.1f} -> 2x8 repeat "
          f"{t_rep*1e3:.1f} ms")


if __name__ == "__main__":
    main()
