"""Per-stage decomposition of the visual-SAC Catch workload (VERDICT r4
item 2 / Weak #2: "visual SAC runs ~3x below V-trace per torso-pass,
unexplained").

Produces, at the bench config (128 envs x unroll 2, batch 256, 4
minibatches/step, polyak each minibatch):

  1. stage table: full train step vs rollout+insert vs a single
     minibatch update; inside the minibatch, loss fwd vs fwd+bwd, replay
     sample, optimizer+polyak;
  2. the conv-torso batch-efficiency curve (fwd / fwd+bwd per frame at
     batch 256..8448) — is the 768-frame minibatch conv underfilling the
     chip vs V-trace's 8448-frame batches?;
  3. torso-frame-pass accounting: measured passes/s vs the V-trace Atari
     line's, which converts the fps gap into (UTD x batch-efficiency)
     factors;
  4. env-count / unroll sweep of the full step.

Run on the real chip: python scripts/profile_sac_visual.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from seed_rl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

PEAK_BF16_FLOPS = 197e12


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) * 0 + 1)


def timeit(name, fn, *args, iters=20, frames=None):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    extra = f" ({frames / dt / 1e3:7.0f}k fr/s)" if frames else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def build(num_envs=128, unroll=2, batch_size=256, minibatches=4):
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agents import sac
    from seed_rl_tpu.envs import BatchedEnv
    from seed_rl_tpu.envs.catch import ContinuousCatchEnv
    from seed_rl_tpu.models.sac_nets import VisualActorCritic
    from seed_rl_tpu.rollout import RolloutEngine

    env = BatchedEnv(ContinuousCatchEnv(), num_envs)
    dist = pd.get_parametric_distribution_for_action_space(env.action_space)
    net = VisualActorCritic(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2,
        conv_dtype=jnp.bfloat16,
    )
    agent = sac.SACAgent(net, dist)
    config = sac.SACConfig(
        batch_size=batch_size,
        train_batches_per_step=minibatches,
        replay_buffer_size=4096,
        replay_buffer_min_size=8,
        unroll_length=unroll,
        polyak=0.995,
    )
    engine = RolloutEngine(env, agent, unroll)
    learner = sac.SACLearner(
        engine, agent, config,
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    warmup = jax.jit(learner.warmup_step)
    while int(state.replay.num_inserted) < 64:
        state = warmup(state)
    return learner, state, config


def main():
    from seed_rl_tpu.agents import sac as sac_mod

    learner, state, config = build()
    B, T, MB = 128, 2, 4
    env_frames = B * T

    print(f"== stage table (envs={B}, unroll={T}, batch={config.batch_size},"
          f" {MB} minibatches/step) ==")
    full = jax.jit(learner.train_step)
    t_full = timeit("full train step", lambda s: full(s)[0], state,
                    frames=env_frames)
    t_roll = timeit("rollout+insert+stats", jax.jit(learner.warmup_step),
                    state, frames=env_frames)

    # single minibatch (sample + loss + opt + polyak)
    def one_mb(state):
        carry = (
            state.params, state.target_net_params, state.opt_state,
            state.replay, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32),
        )
        carry, metrics = learner._train_on_batch(carry, None)
        return carry[0]

    t_mb = timeit("single minibatch update", jax.jit(one_mb), state)
    print(f"stage shares: rollout {t_roll / t_full:5.1%}  "
          f"{MB} minibatches {MB * t_mb / t_full:5.1%}  "
          f"(sum {(t_roll + MB * t_mb) / t_full:5.1%})")

    # inside the minibatch
    _, _, items = learner.replay.sample(
        state.replay, jax.random.PRNGKey(2), config.batch_size,
        priority_exp=0,
    )
    t_sample = timeit(
        "replay sample alone",
        jax.jit(lambda rs: learner.replay.sample(
            rs, jax.random.PRNGKey(2), config.batch_size, priority_exp=0
        )[2]),
        state.replay,
    )
    time_major = jax.tree.map(
        lambda t: jnp.swapaxes(t, 0, 1),
        (items.prev_actions, items.env_outputs, items.agent_actions),
    )
    prev_actions, env_outputs, agent_actions = time_major

    def loss_value(params):
        return sac_mod.compute_loss(
            config, learner.agent, params, state.target_net_params,
            items.agent_state, prev_actions, env_outputs, agent_actions,
            jax.random.PRNGKey(3),
        )[0]

    t_loss_fwd = timeit("loss forward only", jax.jit(loss_value),
                        state.params)
    t_loss_bwd = timeit(
        "loss fwd+bwd", jax.jit(jax.grad(loss_value)), state.params
    )

    def polyak_only(target, params):
        return jax.tree.map(
            lambda t, p: config.polyak * t + (1 - config.polyak) * p,
            target, params["net"],
        )

    t_polyak = timeit("polyak target update alone", jax.jit(polyak_only),
                      state.target_net_params, state.params)
    print(f"minibatch shares: sample {t_sample / t_mb:5.1%}  "
          f"loss fwd+bwd {t_loss_bwd / t_mb:5.1%}  "
          f"polyak {t_polyak / t_mb:5.1%}")

    # ---- torso batch-efficiency curve ----
    print("\n== AtariConvTorso (84x84x1 bf16) batch-efficiency ==")
    from seed_rl_tpu.models.atari import AtariConvTorso

    rng = jax.random.PRNGKey(0)
    torso = AtariConvTorso(dtype=jnp.bfloat16)
    x0 = jax.random.randint(rng, (2, 84, 84, 1), 0, 256, jnp.uint8)
    tp = torso.init(rng, x0)
    for n in [256, 512, 768, 2048, 8448]:
        x = jax.random.randint(rng, (n, 84, 84, 1), 0, 256, jnp.uint8)
        tf = timeit(f"torso fwd      batch {n:5d}",
                    jax.jit(lambda p, x: torso.apply(p, x)), tp, x, frames=n)
        ct = jax.random.normal(rng, (n, 512), jnp.float32)

        @jax.jit
        def fb(p, x, ct):
            out, vjp = jax.vjp(lambda p: torso.apply(p, x), p)
            return vjp(ct)

        tb = timeit(f"torso fwd+bwd  batch {n:5d}", fb, tp, x, ct, frames=n)

    # ---- torso-pass accounting ----
    fps = env_frames / t_full
    passes_per_mb = T * config.batch_size * 3 + (T + 1) * config.batch_size
    passes_per_step = env_frames + MB * passes_per_mb
    print(f"\n== accounting ==")
    print(f"fps (env frames)                 {fps / 1e3:8.1f}k")
    print(f"torso frame-passes / env frame   {passes_per_step / env_frames:8.1f}")
    print(f"torso frame-passes / s           {fps * passes_per_step / env_frames / 1e6:8.2f}M")
    print("(V-trace Atari line: ~430k fps x 4 fwd-equiv = 1.7M passes/s)")

    # ---- shape sweep ----
    print("\n== full-step sweep ==")
    for envs, unroll in [(128, 2), (256, 2), (512, 2), (128, 4), (256, 4)]:
        learner, state, config = build(num_envs=envs, unroll=unroll)
        full = jax.jit(learner.train_step)
        dt = timeit(f"envs={envs:4d} unroll={unroll}",
                    lambda s: full(s)[0], state, frames=envs * unroll)


if __name__ == "__main__":
    main()
