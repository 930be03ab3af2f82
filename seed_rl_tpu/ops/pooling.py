"""Max-pooling with a dense, TPU-friendly backward pass.

``nn.max_pool``'s gradient lowers to XLA ``SelectAndScatter``, which is a
serial-ish window op on TPU: measured 9.7 ms for the backward of a
[8448, 72, 96, 16] 3x3/2 pool on v5e, ~2x the forward's cost and ~12% of
the entire ImpalaDeep train step (scripts/exp_bwd_decomp.py). This module
reimplements the same pooling with a ``jax.custom_vjp`` whose backward is
built from dense ops only:

  1. recompute the per-window argmax as a running (best value, best
     offset-index) chain over the k*k shifted strided slices of the padded
     input (jnp.argmax-style first-max tie-breaking — identical to
     SelectAndScatter's GE-select, which also takes the first maximal
     element in row-major window order);
  2. for each window offset, route the cotangent to inputs that won, then
     combine the k*k contributions by PARITY of the input position: taps
     whose offset is congruent mod the stride land on the same input-pixel
     parity class, so each class is a sum of a few output-sized shifted
     arrays, and the classes interleave into the input grid with one
     pixel-shuffle reshape. Nothing larger than the output is ever
     materialized (a naive ``lax.pad``-dilated scatter materializes k*k
     input-sized intermediates — 17 GB at the DmLab train shape).

Everything is elementwise/pad/slice, so XLA fuses the chain instead of
emitting SelectAndScatter. The forward is byte-identical to
``nn.max_pool`` (same ``reduce_window``); the backward is value-identical
including ties.

Semantics parity target: the reference's ``tf.nn.pool`` MAX inside the
IMPALA resnet stacks (/root/reference/dmlab/networks.py:33-35,
/root/reference/football/networks.py:79-81).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _same_pads(size: int, window: int, stride: int):
    """TF/XLA SAME padding (lo, hi) for one spatial dim."""
    out = -(-size // stride)  # ceil
    total = max((out - 1) * stride + window - size, 0)
    return out, total // 2, total - total // 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_same(x, window=(3, 3), strides=(2, 2)):
    """Max pool over the two middle dims of [N, H, W, C], SAME padding.

    Forward-identical to ``flax.linen.max_pool(x, window, strides,
    "SAME")``; the custom backward avoids SelectAndScatter (see module
    docstring).
    """
    return _pool_fwd_value(x, window, strides)


def _pool_fwd_value(x, window, strides):
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        "SAME",
    )


def _pool_fwd(x, window, strides):
    return _pool_fwd_value(x, window, strides), x


def _shifted_slices(xpad, window, strides, oh, ow):
    """Yield (offset index, [N, OH, OW, C] strided slice) per window tap."""
    for dh in range(window[0]):
        for dw in range(window[1]):
            yield dh, dw, lax.slice(
                xpad,
                (0, dh, dw, 0),
                (
                    xpad.shape[0],
                    dh + (oh - 1) * strides[0] + 1,
                    dw + (ow - 1) * strides[1] + 1,
                    xpad.shape[3],
                ),
                (1, strides[0], strides[1], 1),
            )


def _pool_bwd(window, strides, res, ct):
    x = res
    n, h, w, c = x.shape
    oh, pl_h, phi_h = _same_pads(h, window[0], strides[0])
    ow, pl_w, phi_w = _same_pads(w, window[1], strides[1])

    neg = jnp.asarray(
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        x.dtype,
    )
    xpad = jnp.pad(
        x,
        ((0, 0), (pl_h, phi_h), (pl_w, phi_w), (0, 0)),
        constant_values=neg,
    )

    # Running first-max over the k*k taps (row-major order == XLA's
    # SelectAndScatter visit order, so tie-breaking matches exactly).
    best_val = None
    best_idx = None
    for dh, dw, sl in _shifted_slices(xpad, window, strides, oh, ow):
        k = dh * window[1] + dw
        if best_val is None:
            best_val = sl
            best_idx = jnp.zeros(sl.shape, jnp.int8)
        else:
            better = sl > best_val
            best_val = jnp.where(better, sl, best_val)
            best_idx = jnp.where(better, jnp.int8(k), best_idx)

    # Route ct to each tap's winners, grouped by input-pixel parity: padded
    # input position y = strides[0]*i + dh falls in parity class
    # py = dh % stride, with in-class row i - (dh - py)//stride. Each class
    # is a sum of output-sized shifted arrays; classes interleave back into
    # the padded input grid via a pixel-shuffle reshape, so no input-sized
    # scatter intermediate is ever materialized.
    sh, sw = strides
    assert window[0] <= 2 * sh and window[1] <= 2 * sw, (
        "parity-decomposed pool backward assumes window <= 2*stride"
    )
    # A tap dh maps output row i to in-class row i + (dh - py)//sh, which
    # can reach OH-1 + (window-1)//stride. Those overflow rows map to
    # padded positions y >= sh*OH; they carry real gradient only when the
    # padded input extends past sh*OH on the low-pad side (pl + h >
    # sh*OH, e.g. window == 2*stride). Extend the grids only then — the
    # hot resnet case (3x3/2, SAME) keeps exact [OH, OW] grids, which
    # measure ~7% faster end-to-end (tile-aligned shapes).
    eh = (window[0] - 1) // sh if pl_h + h > sh * oh else 0
    ew = (window[1] - 1) // sw if pl_w + w > sw * ow else 0

    def shifted(g, rh, rw):
        # g[a - rh, b - rw] on an [OH+eh, OW+ew] grid with zero fill.
        if rh == 0 and rw == 0 and eh == 0 and ew == 0:
            return g
        g = jnp.pad(
            g,
            ((0, 0), (rh, max(eh - rh, 0)), (rw, max(ew - rw, 0)), (0, 0)),
        )
        return g[:, : oh + eh, : ow + ew, :]

    # parities[py][px] = [N, OH+eh, OW+ew, C] grid of grads for padded
    # positions (sh*i + py, sw*j + px).
    parities = []
    for py in range(sh):
        row = []
        for px in range(sw):
            acc = None
            for dh in range(py, window[0], sh):
                for dw in range(px, window[1], sw):
                    k = dh * window[1] + dw
                    g = jnp.where(best_idx == jnp.int8(k), ct, 0)
                    g = shifted(g, (dh - py) // sh, (dw - px) // sw)
                    acc = g if acc is None else acc + g
            if acc is None:
                acc = jnp.zeros((n, oh + eh, ow + ew, c), ct.dtype)
            row.append(acc)
        parities.append(row)

    # Interleave: [N, OH', sh, OW', sw, C] -> [N, sh*OH', sw*OW', C].
    rows = [
        jnp.stack(r, axis=3).reshape(n, oh + eh, sw * (ow + ew), c)
        for r in parities
    ]
    grad = jnp.stack(rows, axis=2).reshape(
        n, sh * (oh + eh), sw * (ow + ew), c
    )

    # The interleaved grid covers padded rows [0, sh*OH); the padded input
    # spans [0, h + pl + phi). Any uncovered tail rows are SAME padding
    # (only reachable by taps with dh >= sh at the last window), but guard
    # the slice by padding the grid out to the full padded extent first.
    hp = h + pl_h + phi_h
    wp = w + pl_w + phi_w
    pad_h = max(hp - sh * oh, 0)
    pad_w = max(wp - sw * ow, 0)
    if pad_h or pad_w:
        grad = jnp.pad(grad, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return (
        lax.slice(
            grad, (0, pl_h, pl_w, 0), (n, pl_h + h, pl_w + w, c)
        ),
    )


max_pool_same.defvjp(_pool_fwd, _pool_bwd)
