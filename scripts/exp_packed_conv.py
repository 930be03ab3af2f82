"""Experiment: spatial output-packing for narrow-channel convs on the MXU.

The ImpalaDeep decomposition (profile_impala.py) shows the 16/32-channel
3x3 convs run at 92-98% of the LANE-limited MXU ceiling (cout/128 of
peak). Packing P neighboring output pixels into the channel dim raises
lane occupancy to P*cout/128 at the cost of (kh*kw')/9 redundant FLOPs,
where the packed kernel covers the union of the P windows:

  y[n,i,j,c], j = P*jb+p  ==>  Y[n,i,jb,(p,c)] = conv(x, W')[...]
  W'[di, t, ci, (p, c)] = w[di, t - p, ci, c]  (0 <= t-p < 3, else 0)

1D pack P=8: kernel (3, 10), FLOPs x3.33, lanes x8 -> theoretical 2.4x.
2D pack 2x4: kernel (4, 6), FLOPs x2.67, lanes x8 -> theoretical 3.0x.

This script A/Bs plain vs packed forward (and fwd+bwd via custom
formulations of dx/dw left to a follow-up if fwd pays off) at the
ImpalaDeep stack shapes on the real chip.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

N = 8448  # (T+1) * B at bench shapes


def _fetch(out):
    # The axon relay does not reliably block in block_until_ready
    # (bench.py methodology note); force completion with a scalar
    # device->host read dependent on the result.
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
    print(f"{name:52s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def plain_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_packed_kernel_1d(w, pack):
    """w [3,3,cin,cout] -> W' [3, pack+2, cin, pack*cout]."""
    kh, kw, cin, cout = w.shape
    wp = np.zeros((kh, pack + kw - 1, cin, pack, cout), np.float32)
    wp = jnp.zeros((kh, pack + kw - 1, cin, pack, cout), w.dtype)
    for p in range(pack):
        wp = wp.at[:, p:p + kw, :, p, :].set(w)
    return wp.reshape(kh, pack + kw - 1, cin, pack * cout)


def packed_conv_1d(x, wp, pack, cout):
    """x [N,H,W,cin] SAME 3x3 conv via width-packed kernel."""
    n, h, wdt, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wp, (1, pack), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(n, h, wdt // pack, pack, cout).reshape(
        n, h, wdt, cout
    )


def make_packed_kernel_2d(w, ph, pw):
    """w [3,3,cin,cout] -> W' [ph+2, pw+2, cin, ph*pw*cout]."""
    kh, kw, cin, cout = w.shape
    wp = jnp.zeros((ph + kh - 1, pw + kw - 1, cin, ph, pw, cout), w.dtype)
    for p in range(ph):
        for q in range(pw):
            wp = wp.at[p:p + kh, q:q + kw, :, p, q, :].set(w)
    return wp.reshape(ph + kh - 1, pw + kw - 1, cin, ph * pw * cout)


def packed_conv_2d(x, wp, ph, pw, cout):
    n, h, wdt, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wp, (ph, pw), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(n, h // ph, wdt // pw, ph, pw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h, wdt, cout)


def bench_shape(h, w, cin, cout, pack1d, pack2d):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (N, h, w, cin), jnp.bfloat16)
    wgt = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.05

    print(f"-- conv {cin}->{cout} @{h}x{w} --")
    f_plain = jax.jit(plain_conv)
    t0 = timeit("plain", f_plain, x, wgt)

    wp1 = make_packed_kernel_1d(wgt, pack1d)
    f1 = jax.jit(partial(packed_conv_1d, pack=pack1d, cout=cout))
    t1 = timeit(f"packed 1d P={pack1d} (kernel 3x{pack1d+2})", f1, x, wp1)

    ph, pw = pack2d
    wp2 = make_packed_kernel_2d(wgt, ph, pw)
    f2 = jax.jit(partial(packed_conv_2d, ph=ph, pw=pw, cout=cout))
    t2 = timeit(f"packed 2d {ph}x{pw} (kernel {ph+2}x{pw+2})", f2, x, wp2)

    # correctness: scalar max-err computed on device (a full-array host
    # fetch over the axon relay takes minutes at these sizes)
    err_fn = jax.jit(
        lambda a, b: jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)
        ))
    )
    y0 = f_plain(x, wgt)
    err1 = float(err_fn(y0, f1(x, wp1)))
    err2 = float(err_fn(y0, f2(x, wp2)))
    print(f"   speedup 1d {t0/t1:.2f}x (maxerr {err1:.2e}), "
          f"2d {t0/t2:.2f}x (maxerr {err2:.2e})")


def main():
    lanes = 128
    # stack0 residual convs: 16->16 @36x48 (post-pool res blocks)
    bench_shape(36, 48, 16, 16, pack1d=lanes // 16, pack2d=(2, 4))
    # stack0 downscale conv: 3->16 @72x96
    bench_shape(72, 96, 3, 16, pack1d=lanes // 16, pack2d=(2, 4))
    # stack1 residual convs: 32->32 @18x24
    bench_shape(18, 24, 32, 32, pack1d=lanes // 32, pack2d=(2, 2))
    # stack1 downscale: 16->32 @36x48
    bench_shape(36, 48, 16, 32, pack1d=lanes // 32, pack2d=(2, 2))
    # stack2 residual convs: 32->32 @9x12 -> width 12 % 4 == 0
    bench_shape(9, 12, 32, 32, pack1d=4, pack2d=(1, 4))


if __name__ == "__main__":
    main()
