"""Attribute the ImpalaDeep backward time (VERDICT r4 item 1 follow-up).

profile_impala.py measured torso fwd 23.9 ms vs fwd+bwd 91.2 ms at the
[33*256, 72, 96, 3] train shape — a 2.8x bwd/fwd ratio where ~2x is
expected. This probe times each component's backward ALONE via jax.vjp
with a RANDOM cotangent (a `.sum()` loss lets XLA constant-fold an
all-ones cotangent through linear ops, which silently deflates naive
grad-based timings). Prime suspect: max_pool's gradient lowers to XLA
SelectAndScatter, a historically slow TPU op.

Run: python scripts/exp_bwd_decomp.py [--n 8448]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

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


def fwd_and_bwd_times(name, f, *primals, rng=None):
    """Time f's forward and its vjp with a random cotangent, separately."""
    fwd = jax.jit(f)
    out = fwd(*primals)
    ct = jax.tree.map(
        lambda o: jax.random.normal(rng, o.shape, o.dtype), out
    )

    @jax.jit
    def bwd(primals, ct):
        _, vjp_fn = jax.vjp(f, *primals)
        return vjp_fn(ct)

    tf = timeit(f"{name} fwd", fwd, *primals)
    tb = timeit(f"{name} bwd(vjp, rand ct)", bwd, primals, ct)
    # NB: bwd here re-runs the forward inside vjp (residual recompute is
    # fused away by XLA where possible); report the pair plus the delta.
    print(f"  -> bwd-incl-fwd/fwd {tb / tf:5.2f}x; bwd-only est "
          f"{1e3 * (tb - tf):7.2f} ms")
    return tf, tb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8448)
    args = ap.parse_args()
    n = args.n
    rng = jax.random.PRNGKey(0)

    from seed_rl_tpu.models.resnets import ImpalaResNetTorso, ResidualStack

    # ---- full torso ----
    print("== full torso ==")
    frames = jax.random.randint(rng, (n, 72, 96, 3), 0, 256, jnp.uint8)
    torso = ImpalaResNetTorso(dtype=jnp.bfloat16)
    tp = torso.init(rng, frames[:2])
    fwd_and_bwd_times(
        "torso", lambda p, x: torso.apply(p, x), tp, frames, rng=rng
    )

    # ---- per-stack ----
    print("\n== per-stack ==")
    shapes = [(72, 96, 3, 16), (36, 48, 16, 32), (18, 24, 32, 32)]
    for i, (h, w, cin, cout) in enumerate(shapes):
        x = jax.random.normal(rng, (n, h, w, cin), jnp.bfloat16)
        st = ResidualStack(cout, 2, dtype=jnp.bfloat16)
        sp = st.init(rng, x[:2])
        fwd_and_bwd_times(
            f"stack{i} {cin}->{cout} @{h}x{w}",
            lambda p, x, st=st: st.apply(p, x), sp, x, rng=rng,
        )

    # ---- maxpool alone ----
    print("\n== max_pool 3x3/2 SAME alone ==")
    for h, w, c in [(72, 96, 16), (36, 48, 32), (18, 24, 32)]:
        x = jax.random.normal(rng, (n, h, w, c), jnp.bfloat16)

        def pool(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        fwd_and_bwd_times(f"pool @{h}x{w}x{c}", pool, x, rng=rng)

    # ---- single convs alone, dx and dp separately ----
    print("\n== single 3x3 convs: vjp split into dx / dp ==")
    for h, w, cin, cout, tag in [
        (72, 96, 3, 16, "stack0 downscale"),
        (36, 48, 16, 16, "stack0 res conv"),
        (36, 48, 16, 32, "stack1 downscale"),
        (18, 24, 32, 32, "stack1 res conv"),
    ]:
        x = jax.random.normal(rng, (n, h, w, cin), jnp.bfloat16)
        conv = nn.Conv(cout, (3, 3), padding="SAME", dtype=jnp.bfloat16)
        cp = conv.init(rng, x[:2])
        ct = jax.random.normal(rng, (n, h, w, cout), jnp.bfloat16)

        f = lambda p, x, conv=conv: conv.apply(p, x)
        fwd_and_bwd_times(f"{tag} {cin}->{cout} @{h}x{w}", f, cp, x, rng=rng)

        @jax.jit
        def dx_only(p, x, ct, f=f):
            _, vjp_fn = jax.vjp(functools.partial(f, p), x)
            return vjp_fn(ct)

        @jax.jit
        def dp_only(p, x, ct, f=f):
            _, vjp_fn = jax.vjp(lambda p: f(p, x), p)
            return vjp_fn(ct)

        timeit(f"  dx only (incl fwd)", dx_only, cp, x, ct)
        timeit(f"  dp only (incl fwd)", dp_only, cp, x, ct)


if __name__ == "__main__":
    main()
