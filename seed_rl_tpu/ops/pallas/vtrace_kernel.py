"""Fused V-trace kernel (Pallas/TPU).

The lax.scan formulation (seed_rl_tpu.ops.vtrace) materializes rhos, deltas
and the backward recursion as separate HBM-resident intermediates. This
kernel computes the whole thing — importance weights, clipping, deltas, the
backward accumulation, and policy-gradient advantages — in one pass with all
[T, TILE_B] working data resident in VMEM: one HBM read per input element
and one write per output element, which is the bandwidth floor for this op.

The batch axis is tiled to the 128-lane VPU width (grid over B/TILE). Time
stays in sublanes; the backward recursion is a fori_loop over VMEM rows.
Used when B % 128 == 0 and the backend is TPU; otherwise the scan fallback
is numerically identical (see tests/test_pallas_vtrace.py).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seed_rl_tpu.ops import vtrace as vtrace_ref

TILE_B = 128


def _vtrace_kernel(
    clip_rho_threshold,
    clip_pg_rho_threshold,
    lambda_,
    target_logp_ref,
    behaviour_logp_ref,
    discounts_ref,
    rewards_ref,
    values_ref,
    bootstrap_ref,
    vs_ref,
    pg_adv_ref,
    acc_ref,
    deltas_ref,
    dc_ref,
):
    T = target_logp_ref.shape[0]

    log_rhos = target_logp_ref[:] - behaviour_logp_ref[:]
    rhos = jnp.exp(log_rhos)
    if clip_rho_threshold is not None:
        clipped_rhos = jnp.minimum(clip_rho_threshold, rhos)
    else:
        clipped_rhos = rhos
    cs = lambda_ * jnp.minimum(1.0, rhos)

    values = values_ref[:]
    bootstrap = bootstrap_ref[:]
    # values shifted by one: rows 1..T-1 then bootstrap.
    values_p1 = jnp.concatenate([values[1:], bootstrap], axis=0)
    discounts = discounts_ref[:]
    # Stage loop-carried rows in VMEM scratch: Mosaic supports dynamic row
    # indexing on refs, not on values.
    deltas_ref[:] = clipped_rhos * (
        rewards_ref[:] + discounts * values_p1 - values
    )
    dc_ref[:] = discounts * cs  # fused per-step decay factor

    # Backward recursion: acc = delta_t + (discount_t * c_t) * acc.
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        t = T - 1 - i
        acc = deltas_ref[t, :][None, :] + dc_ref[t, :][None, :] * acc_ref[:]
        acc_ref[:] = acc
        vs_ref[t, :] = acc[0] + values_ref[t, :]
        return ()

    jax.lax.fori_loop(0, T, body, ())

    # pg_advantages = clipped_pg_rhos * (r + discount * vs_{t+1} - values).
    vs = vs_ref[:]
    vs_p1 = jnp.concatenate([vs[1:], bootstrap], axis=0)
    if clip_pg_rho_threshold is not None:
        clipped_pg = jnp.minimum(clip_pg_rho_threshold, rhos)
    else:
        clipped_pg = rhos
    pg_adv_ref[:] = clipped_pg * (rewards_ref[:] + discounts * vs_p1 - values)


def from_importance_weights_pallas(
    target_action_log_probs,
    behaviour_action_log_probs,
    discounts,
    rewards,
    values,
    bootstrap_value,
    clip_rho_threshold: Optional[float] = 1.0,
    clip_pg_rho_threshold: Optional[float] = 1.0,
    lambda_: float = 1.0,
    interpret: bool = False,
) -> vtrace_ref.VTraceReturns:
    """Pallas V-trace; same contract as ops.vtrace.from_importance_weights."""
    T, B = rewards.shape
    assert B % TILE_B == 0, (
        f"B={B} must be a multiple of {TILE_B}; use the lax.scan version "
        "otherwise"
    )
    f32 = jnp.float32
    # vs/pg_advantages are constants w.r.t. the loss (both returns are
    # stop_gradient'ed below, matching the scan version and the reference's
    # target semantics) — zeroing the input tangents here keeps the
    # pallas_call out of the JVP path entirely (pallas_call has no JVP rule
    # for kernels with scratch buffers).
    args = [
        jax.lax.stop_gradient(jnp.asarray(target_action_log_probs, f32)),
        jax.lax.stop_gradient(jnp.asarray(behaviour_action_log_probs, f32)),
        jax.lax.stop_gradient(jnp.asarray(discounts, f32)),
        jax.lax.stop_gradient(jnp.asarray(rewards, f32)),
        jax.lax.stop_gradient(jnp.asarray(values, f32)),
        jax.lax.stop_gradient(
            jnp.asarray(bootstrap_value, f32)
        )[None, :],  # [1, B] for tiling
    ]

    kernel = functools.partial(
        _vtrace_kernel,
        clip_rho_threshold,
        clip_pg_rho_threshold,
        lambda_,
    )
    tb_spec = pl.BlockSpec(
        (T, TILE_B), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    boot_spec = pl.BlockSpec(
        (1, TILE_B), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    vs, pg_adv = pl.pallas_call(
        kernel,
        grid=(B // TILE_B,),
        in_specs=[tb_spec] * 5 + [boot_spec],
        out_specs=[tb_spec, tb_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), f32),
            jax.ShapeDtypeStruct((T, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, TILE_B), f32),
            pltpu.VMEM((T, TILE_B), f32),
            pltpu.VMEM((T, TILE_B), f32),
        ],
        interpret=interpret,
    )(*args)
    return vtrace_ref.VTraceReturns(
        vs=jax.lax.stop_gradient(vs),
        pg_advantages=jax.lax.stop_gradient(pg_adv),
    )


def from_importance_weights(*args, **kwargs):
    """Dispatch: Pallas on TPU with aligned batch, else the scan version."""
    rewards = args[3] if len(args) > 3 else kwargs["rewards"]
    backend = jax.default_backend()
    if backend == "tpu" and rewards.shape[1] % TILE_B == 0:
        return from_importance_weights_pallas(*args, **kwargs)
    return vtrace_ref.from_importance_weights(*args, **kwargs)
