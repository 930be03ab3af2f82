"""Per-stage decomposition + FLOPs/MFU model for the DmLab/ImpalaDeep line.

VERDICT r4 item 1: the `dmlab_vtrace_env_frames_per_sec_per_chip` bench
(71.7k fps = 1.8x the 40k anchor) is the only apples-to-apples baseline
number and had no decomposition. This script produces:

  1. the proper-sync stage table: full train step vs rollout-only vs
     update-only; inside the update, loss-forward vs backward;
  2. torso isolation at the train shape: per-stack forward times, dense,
     LSTM, and full-torso fwd/fwd+bwd;
  3. an explicit per-frame FLOPs model for ImpalaDeep on 72x96x3 (counted
     from the conv/dense/LSTM shapes, not asserted) and the derived MFU at
     the measured throughput;
  4. an HBM-traffic model for the same stages (activations in/out per conv)
     to say which roofline each stage sits under.

Run on the real chip: `python scripts/profile_impala.py [--envs 256]`.
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from seed_rl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

# TPU v5e (one chip): public peak numbers used for MFU derivation.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_PER_S = 819e9


def _fetch(out):
    # The axon relay does not reliably block in block_until_ready
    # (bench.py methodology note); force completion with a scalar
    # device->host read dependent on the result.
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
    extra = ""
    if frames:
        extra = f" ({frames / dt / 1e3:7.0f}k fps)"
    print(f"{name:46s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def conv_flops(h, w, cin, cout, k=3):
    """MACs*2 for a stride-1 SAME kxk conv at [h, w]."""
    return h * w * cout * cin * k * k * 2


def impala_flops_per_frame(h=72, w=96, cin=3, stacks=((16, 2), (32, 2), (32, 2)),
                           dense_out=256, lstm=256, num_actions=9):
    """Forward FLOPs per frame for ImpalaDeep (conv + dense + lstm + heads)."""
    total = 0
    detail = {}
    x_h, x_w, c = h, w, cin
    for i, (ch, blocks) in enumerate(stacks):
        f = conv_flops(x_h, x_w, c, ch)  # downscale conv (pre-pool, full res)
        x_h, x_w = (x_h + 1) // 2, (x_w + 1) // 2
        for _ in range(blocks):
            f += 2 * conv_flops(x_h, x_w, ch, ch)
        detail[f"stack{i}({ch}ch)"] = f
        total += f
        c = ch
    flat = x_h * x_w * c
    detail["dense"] = flat * dense_out * 2
    total += detail["dense"]
    # LSTM: 4 gates, input = dense_out + 1 + num_actions, recurrent = lstm.
    lstm_in = dense_out + 1 + num_actions
    detail["lstm"] = 4 * (lstm_in + lstm) * lstm * 2
    total += detail["lstm"]
    detail["heads"] = lstm * (num_actions + 1) * 2
    total += detail["heads"]
    return total, detail


def impala_hbm_bytes_per_frame(h=72, w=96, cin=3,
                               stacks=((16, 2), (32, 2), (32, 2)),
                               bytes_per_el=2):
    """Activation HBM traffic per frame, forward: each conv reads its input
    and writes its output (weights are tiny and stay in VMEM/cache)."""
    total = 0
    x_h, x_w, c = h, w, cin
    for ch, blocks in stacks:
        total += x_h * x_w * (c + ch) * bytes_per_el  # downscale conv
        total += x_h * x_w * ch * bytes_per_el        # pool read (write half)
        x_h, x_w = (x_h + 1) // 2, (x_w + 1) // 2
        total += x_h * x_w * ch * bytes_per_el
        for _ in range(blocks):
            total += 2 * 2 * x_h * x_w * ch * bytes_per_el  # 2 convs r+w
        c = ch
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--unroll", type=int, default=32)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.envs import BatchedEnv
    from seed_rl_tpu.envs.synthetic import SyntheticDmLabEnv
    from seed_rl_tpu.models.resnets import ImpalaDeep, ImpalaResNetTorso
    from seed_rl_tpu.rollout import RolloutEngine

    B, T = args.envs, args.unroll
    num_actions = 9
    env = BatchedEnv(SyntheticDmLabEnv(num_actions=num_actions), B)
    dist = pd.CategoricalDistribution(num_actions)
    net = ImpalaDeep(
        num_actions=num_actions, dtype=jnp.bfloat16, remat=args.remat
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, T)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(),
        optax.chain(optax.clip_by_global_norm(40.0), optax.adam(3e-4)),
    )
    rng = jax.random.PRNGKey(0)
    state = jax.jit(learner.init)(rng)
    frames = B * T

    print(f"== stage table (B={B}, T={T}, remat={args.remat}) ==")
    full = jax.jit(learner.train_step)
    t_full = timeit("full train step", full, state, frames=frames)

    rollout = jax.jit(lambda s: engine.rollout(s.params["net"], s.rollout))
    t_roll = timeit("rollout only", rollout, state, frames=frames)

    _, unroll_data = rollout(state)
    upd = jax.jit(lambda s, u: learner.update(s, u, jax.random.PRNGKey(1)))
    t_upd = timeit("update only (loss+bwd+opt)", upd, state, unroll_data,
                   frames=frames)

    import functools
    loss_fn = functools.partial(
        vtrace_agent.compute_loss, learner.config, agent, dist
    )
    fwd_loss = jax.jit(
        lambda p, u: loss_fn(p, u, jax.random.PRNGKey(1))[0]
    )
    t_loss_fwd = timeit("loss forward only", fwd_loss, state.params,
                        unroll_data, frames=frames)
    grad_loss = jax.jit(jax.grad(
        lambda p, u: loss_fn(p, u, jax.random.PRNGKey(1))[0]
    ))
    t_loss_bwd = timeit("loss fwd+bwd", grad_loss, state.params, unroll_data,
                        frames=frames)

    print(f"\nstage shares of full step: rollout {t_roll / t_full:5.1%}  "
          f"update {t_upd / t_full:5.1%}  "
          f"(sum {100 * (t_roll + t_upd) / t_full:5.1f}%)")

    # ---- torso isolation at the train shape ----
    print(f"\n== torso isolation ([{(T + 1) * B} frames, 72x96x3]) ==")
    n_train = (T + 1) * B
    frames_u8 = jax.random.randint(
        rng, (n_train, 72, 96, 3), 0, 256, jnp.uint8
    )
    torso = ImpalaResNetTorso(dtype=jnp.bfloat16)
    tp = torso.init(rng, frames_u8[:2])
    t_torso_fwd = timeit(
        "torso fwd", jax.jit(lambda p, x: torso.apply(p, x)), tp, frames_u8,
        frames=n_train,
    )
    t_torso_bwd = timeit(
        "torso fwd+bwd",
        jax.jit(jax.grad(
            lambda p, x: torso.apply(p, x).astype(jnp.float32).sum()
        )),
        tp, frames_u8, frames=n_train,
    )

    # per-stack forward at its true input shape
    from seed_rl_tpu.models.resnets import ResidualStack
    shapes = [(72, 96, 3, 16), (36, 48, 16, 32), (18, 24, 32, 32)]
    stack_ts = []
    for i, (h, w, cin, cout) in enumerate(shapes):
        x = jax.random.normal(rng, (n_train, h, w, cin), jnp.bfloat16)
        st = ResidualStack(cout, 2, dtype=jnp.bfloat16)
        sp = st.init(rng, x[:2])
        stack_ts.append(timeit(
            f"stack{i} {cin}->{cout}ch @{h}x{w}",
            jax.jit(lambda p, x, st=st: st.apply(p, x)), sp, x,
            frames=n_train,
        ))

    xd = jax.random.normal(rng, (n_train, 9 * 12 * 32), jnp.bfloat16)
    dense = nn.Dense(256, dtype=jnp.bfloat16)
    dp = dense.init(rng, xd[:2])
    timeit("dense 3456->256", jax.jit(lambda p, x: dense.apply(p, x)),
           dp, xd, frames=n_train)

    xl = jax.random.normal(rng, (T + 1, B, 266), jnp.float32)
    cell = nn.OptimizedLSTMCell(256)
    carry = cell.initialize_carry(rng, (B, 266))
    cp = cell.init(rng, carry, xl[0])

    def lstm_scan(p, x):
        def step(c, xt):
            return cell.apply(p, c, xt)
        _, outs = jax.lax.scan(step, carry, x)
        return outs

    timeit("LSTM(256) scan fwd [T+1,B]", jax.jit(lstm_scan), cp, xl,
           frames=n_train)
    timeit("LSTM(256) scan fwd+bwd [T+1,B]",
           jax.jit(jax.grad(lambda p, x: lstm_scan(p, x).sum())), cp, xl,
           frames=n_train)

    # ---- FLOPs + HBM model ----
    fwd_flops, detail = impala_flops_per_frame()
    hbm_fwd = impala_hbm_bytes_per_frame()
    print("\n== FLOPs model (per frame, forward) ==")
    for k, v in detail.items():
        print(f"  {k:16s} {v / 1e6:8.2f} MFLOP")
    print(f"  {'total fwd':16s} {fwd_flops / 1e6:8.2f} MFLOP")
    print(f"  activation HBM traffic fwd ~{hbm_fwd / 1e3:.0f} KB/frame")

    # Per env frame in the fused step: rollout = 1 fwd; train = fwd + bwd
    # on (T+1)/T frames. bwd ~= 2x fwd FLOPs.
    train_mult = (T + 1) / T
    flops_per_env_frame = fwd_flops * (1.0 + 3.0 * train_mult)
    fps_full = frames / t_full
    achieved = fps_full * flops_per_env_frame
    print(f"\n== MFU at the measured step ==")
    print(f"  fps (this config)          {fps_full / 1e3:8.1f}k")
    print(f"  FLOPs/env-frame (1 fwd + {train_mult:.2f}x(fwd+bwd))"
          f" = {flops_per_env_frame / 1e6:.1f} MFLOP")
    print(f"  achieved compute           {achieved / 1e12:8.2f} TFLOP/s")
    print(f"  MFU vs {PEAK_BF16_FLOPS / 1e12:.0f} TF bf16 peak   "
          f"{achieved / PEAK_BF16_FLOPS:8.2%}")

    # stage-level MFU: torso fwd alone
    mfu_torso = (fwd_flops - detail["lstm"] - detail["heads"]) * n_train / (
        t_torso_fwd * PEAK_BF16_FLOPS
    )
    hbm_frac = hbm_fwd * n_train / (t_torso_fwd * PEAK_HBM_BYTES_PER_S)
    print(f"  torso-fwd MFU              {mfu_torso:8.2%}")
    print(f"  torso-fwd HBM fraction     {hbm_frac:8.2%} of "
          f"{PEAK_HBM_BYTES_PER_S / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
