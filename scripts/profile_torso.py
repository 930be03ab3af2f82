"""Isolate the Atari torso / LSTM / frame-stack costs at bench shapes."""

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

from seed_rl_tpu.models.atari import AtariConvTorso, stack_frames_time_major

T, B = 32, 1024
FRAMES = T * B


def _fetch(out):
    # The axon relay does not reliably block in block_until_ready
    # (bench.py methodology note); force completion with a scalar read.
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) * 0 + 1)


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms ({FRAMES / dt / 1e3:6.0f}k fps)",
          flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    frames = jax.random.randint(rng, (FRAMES, 84, 84, 4), 0, 256, jnp.uint8)
    obs_seq = jax.random.randint(rng, (T, B, 84, 84, 1), 0, 256, jnp.uint8)
    done_seq = jnp.zeros((T, B), bool)

    torso = AtariConvTorso(dtype=jnp.bfloat16)
    params = torso.init(rng, frames[:2])

    fwd = jax.jit(lambda p, x: torso.apply(p, x))
    timeit("torso fwd [T*B]", fwd, params, frames)

    g = jax.jit(jax.grad(lambda p, x: torso.apply(p, x).sum()))
    timeit("torso fwd+bwd [T*B]", g, params, frames)

    stackf = jax.jit(
        lambda o, d: stack_frames_time_major(
            o, jnp.zeros((B, 84, 84, 3), jnp.uint8), d, 4
        )[0]
    )
    timeit("frame stacking scan [T,B]", stackf, obs_seq, done_seq)

    # LSTM core at training shape.
    x = jax.random.normal(rng, (T, B, 531), jnp.float32)
    cell = nn.OptimizedLSTMCell(256)
    carry = cell.initialize_carry(rng, (B, 531))
    cp = cell.init(rng, carry, x[0])

    def lstm_scan(p, x):
        def step(c, xt):
            c, out = cell.apply(p, c, xt)
            return c, out
        _, outs = jax.lax.scan(step, carry, x)
        return outs

    timeit("LSTM(256) scan fwd [T,B]", jax.jit(lstm_scan), cp, x)
    timeit(
        "LSTM(256) scan fwd+bwd [T,B]",
        jax.jit(jax.grad(lambda p, x: lstm_scan(p, x).sum())),
        cp,
        x,
    )

    # Individual convs at [T*B].
    import functools

    def one_conv(feat, k, s, cin, hw):
        x = jax.random.normal(rng, (FRAMES, hw, hw, cin), jnp.bfloat16)
        conv = nn.Conv(feat, (k, k), strides=(s, s), padding="VALID",
                       dtype=jnp.bfloat16)
        p = conv.init(rng, x[:2])
        timeit(
            f"conv {cin}->{feat} k{k}s{s} @{hw}",
            jax.jit(lambda p, x: conv.apply(p, x)),
            p,
            x,
        )

    one_conv(32, 8, 4, 4, 84)
    one_conv(64, 4, 2, 32, 20)
    one_conv(64, 3, 1, 64, 9)

    # Space-to-depth variant of conv1: [B,21,21,64] -> 2x2 s1 conv -> 20x20x32.
    xs2d = jax.random.normal(rng, (FRAMES, 21, 21, 64), jnp.bfloat16)
    conv_s2d = nn.Conv(32, (2, 2), strides=(1, 1), padding="VALID",
                       dtype=jnp.bfloat16)
    ps2d = conv_s2d.init(rng, xs2d[:2])
    timeit("conv1 as s2d 64->32 k2s1 @21",
           jax.jit(lambda p, x: conv_s2d.apply(p, x)), ps2d, xs2d)

    # Dense 3136 -> 512.
    xd = jax.random.normal(rng, (FRAMES, 3136), jnp.bfloat16)
    dense = nn.Dense(512, dtype=jnp.bfloat16)
    pd_ = dense.init(rng, xd[:2])
    timeit("dense 3136->512", jax.jit(lambda p, x: dense.apply(p, x)), pd_, xd)


if __name__ == "__main__":
    main()
