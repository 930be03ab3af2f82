"""Fused n-step-Bellman-target + priority kernel (Pallas/TPU).

R2D2's target path (reference agents/r2d2/learner.py:180-330) chains value
un-rescaling, the n-step backward recursion, re-rescaling, TD errors and the
eta-mixed max/mean priority reduction. The lax-level formulation
(seed_rl_tpu.ops.value_ops) materializes each stage; this kernel keeps all
[T, TILE_B] working rows VMEM-resident and does one HBM pass: read the four
[T, B] inputs once, write the [T-1, B] rescaled targets and the [B]
priorities once (SURVEY.md §7 step 8: "fused n-step-target + priority
kernel").

Differentiation contract: the targets and priorities are stop-gradient by
definition (reference learner.py:309, 325-329), so the kernel itself is
non-differentiable; the wrapper computes the squared-TD loss outside the
kernel from the (differentiable) gathered online Q values, which is where
gradients flow in the fallback as well.

Batch tiling: grid over B/128 when lane-aligned; otherwise a single program
over the whole [T, B] block (Mosaic pads the lanes — fine for the small
batches R2D2 trains on, e.g. 64).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seed_rl_tpu.ops import value_ops

TILE_B = 128


def _nstep_kernel(
    gamma,
    n_steps,
    eta,
    eps,
    tq_ref,  # [T, Bt] target-net Q at online argmax (still h-rescaled)
    r_ref,  # [T, Bt] rewards
    done_ref,  # [T, Bt] done as f32
    q_ref,  # [T, Bt] online Q at replayed action
    tgt_ref,  # out [T-1, Bt] rescaled n-step targets
    pri_ref,  # out [1, Bt] priorities
):
    qt = value_ops.inverse_value_function_rescaling(tq_ref[:], eps)
    # Length-(T+n) padded arrays, exactly as the reference recursion
    # (learner.py:203-236); all shapes static, everything stays in VMEM.
    bt = jnp.concatenate(
        [jnp.zeros_like(qt[0:1]), qt]
        + [qt[-1:] / gamma**k for k in range(1, n_steps)],
        axis=0,
    )
    done_f = jnp.concatenate(
        [done_ref[:]] + [jnp.zeros_like(r_ref[0:1])] * n_steps, axis=0
    )
    rew = jnp.concatenate(
        [r_ref[:]] + [jnp.zeros_like(r_ref[0:1])] * n_steps, axis=0
    )
    for _ in range(n_steps):
        rew = rew[:-1]
        done_f = done_f[:-1]
        bt = rew + gamma * (1.0 - done_f) * bt[1:]

    # Shift by one (unrolls store post-transition observations) + re-rescale.
    tgt = value_ops.value_function_rescaling(bt[1:], eps)
    tgt_ref[:] = tgt
    abs_td = jnp.abs(tgt - q_ref[: tgt.shape[0], :])
    pri_ref[:] = eta * jnp.max(abs_td, axis=0, keepdims=True) + (
        1.0 - eta
    ) * jnp.mean(abs_td, axis=0, keepdims=True)


def _targets_and_priorities_pallas(
    qtarget_max: jnp.ndarray,
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    replay_q: jnp.ndarray,
    gamma: float,
    n_steps: int,
    eta: float,
    eps: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T, B = rewards.shape
    f32 = jnp.float32
    args = [
        jnp.asarray(qtarget_max, f32),
        jnp.asarray(rewards, f32),
        done.astype(f32),
        jax.lax.stop_gradient(jnp.asarray(replay_q, f32)),
    ]
    kernel = functools.partial(_nstep_kernel, gamma, n_steps, eta, eps)
    tile_b = TILE_B if B % TILE_B == 0 else B
    in_spec = pl.BlockSpec((T, tile_b), lambda j: (0, j), memory_space=pltpu.VMEM)
    tgt, pri = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[in_spec] * 4,
        out_specs=[
            pl.BlockSpec((T - 1, tile_b), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T - 1, B), f32),
            jax.ShapeDtypeStruct((1, B), f32),
        ],
        interpret=interpret,
    )(*args)
    return jax.lax.stop_gradient(tgt), jax.lax.stop_gradient(pri[0])


def td_loss_and_priorities(
    q_values: jnp.ndarray,
    target_q_values: jnp.ndarray,
    online_argmax_action: jnp.ndarray,
    replay_action: jnp.ndarray,
    rewards: jnp.ndarray,
    done: jnp.ndarray,
    gamma: float,
    n_steps: int,
    eta: float = 0.9,
    rescaling_eps: float = 1e-3,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused variant of ops.value_ops.td_loss_and_priorities (same contract)."""
    replay_q = jnp.take_along_axis(
        jnp.asarray(q_values, jnp.float32), replay_action[..., None], axis=2
    ).squeeze(-1)
    qtarget_max = jnp.take_along_axis(
        jnp.asarray(target_q_values, jnp.float32),
        online_argmax_action[..., None],
        axis=2,
    ).squeeze(-1)
    tgt, priorities = _targets_and_priorities_pallas(
        qtarget_max,
        rewards,
        done,
        replay_q,
        gamma,
        n_steps,
        eta,
        rescaling_eps,
        interpret=interpret,
    )
    loss = 0.5 * jnp.sum(jnp.square(tgt - replay_q[:-1]), axis=0)
    return loss, priorities


def td_loss_and_priorities_dispatch(*args, **kwargs):
    """Pallas on TPU, lax fallback elsewhere (numerically identical)."""
    if jax.default_backend() == "tpu":
        return td_loss_and_priorities(*args, **kwargs)
    return value_ops.td_loss_and_priorities(*args, **kwargs)
