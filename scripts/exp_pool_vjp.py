"""A/B: nn.max_pool (SelectAndScatter bwd) vs ops.pooling.max_pool_same
(dense custom VJP) — pool alone, full torso, and the full DmLab V-trace
train step. Run on the real chip: python scripts/exp_pool_vjp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from seed_rl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) * 0 + 1)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from seed_rl_tpu.ops.pooling import max_pool_same

    rng = jax.random.PRNGKey(0)
    n = 8448

    print("== pool alone: bwd(vjp, rand ct) ==")
    for h, w, c in [(72, 96, 16), (36, 48, 32), (18, 24, 32)]:
        x = jax.random.normal(rng, (n, h, w, c), jnp.bfloat16)
        ct = jax.random.normal(
            rng, ((n,) + jax.eval_shape(max_pool_same, x).shape[1:]),
            jnp.bfloat16,
        )

        def old_bwd(x, ct):
            _, vjp = jax.vjp(
                lambda x: nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding="SAME"
                ),
                x,
            )
            return vjp(ct)

        def new_bwd(x, ct):
            _, vjp = jax.vjp(lambda x: max_pool_same(x), x)
            return vjp(ct)

        t_old = timeit(f"@{h}x{w}x{c} SelectAndScatter", jax.jit(old_bwd),
                       x, ct)
        t_new = timeit(f"@{h}x{w}x{c} dense custom vjp", jax.jit(new_bwd),
                       x, ct)
        print(f"  -> speedup {t_old / t_new:5.2f}x")

    # ---- full torso fwd+bwd ----
    print("\n== torso fwd+bwd(vjp, rand ct wrt params) ==")
    from seed_rl_tpu.models.resnets import ImpalaResNetTorso

    frames = jax.random.randint(rng, (n, 72, 96, 3), 0, 256, jnp.uint8)
    for custom in [False, True]:
        torso = ImpalaResNetTorso(dtype=jnp.bfloat16, custom_pool_bwd=custom)
        tp = torso.init(rng, frames[:2])
        ct = jax.random.normal(rng, (n, 256), jnp.float32)

        @jax.jit
        def full_bwd(p, x, ct, torso=torso):
            out, vjp = jax.vjp(lambda p: torso.apply(p, x), p)
            return vjp(ct)

        timeit(f"torso fwd+bwd custom_pool_bwd={custom}", full_bwd, tp,
               frames, ct)

    # ---- full train step ----
    print("\n== full DmLab V-trace train step (B=256, T=32) ==")
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.envs import BatchedEnv
    from seed_rl_tpu.envs.synthetic import SyntheticDmLabEnv
    from seed_rl_tpu.models.resnets import ImpalaDeep
    from seed_rl_tpu.rollout import RolloutEngine

    B, T = 256, 32
    for custom in [False, True]:
        env = BatchedEnv(SyntheticDmLabEnv(num_actions=9), B)
        dist = pd.CategoricalDistribution(9)
        net = ImpalaDeep(num_actions=9, dtype=jnp.bfloat16,
                         custom_pool_bwd=custom)
        agent = PolicyAgent(net, dist)
        engine = RolloutEngine(env, agent, T)
        learner = vtrace_agent.VTraceLearner(
            engine, agent, vtrace_agent.VTraceConfig(),
            optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
        )
        state = jax.jit(learner.init)(jax.random.PRNGKey(0))
        full = jax.jit(learner.train_step)
        dt = timeit(f"train step custom_pool_bwd={custom}", full, state)
        print(f"  -> {B * T / dt / 1e3:7.1f}k env frames/s")


if __name__ == "__main__":
    main()
