"""Streaming observation normalization (V-trace/SAC style).

Parity with /root/reference/common/normalizer.py:
- ``Normalizer`` (:21-152): element-wise mean/std tracked via sum/sumsq/step
  accumulators; normalization is ``clip((x - mean) / (std + eps), clip_range)``.
  The reference's two-phase TPU update (local ``only_accumulate`` then
  cross-replica ``finish_update`` all-reduce, :71-122) collapses here into a
  single functional ``update``: under SPMD a ``psum`` over the mesh axis
  makes the increments global, and XLA handles the rest.
- ``NormalizeObservationsWrapper`` (:155-211) becomes the small agent
  wrappers in ``seed_rl_tpu.agent``/``agents.sac`` that normalize
  ``env_output.observation`` (flattened along the last axis) before the
  underlying network sees it, with stats updated once per training step
  (reference ``end_of_training_step_callback``, :197-198).

State is a plain NamedTuple so it can ride inside any param tree; it is
always consumed under ``stop_gradient`` (the reference's variables are
non-trainable).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class NormalizerState(NamedTuple):
    steps: jnp.ndarray  # f32 scalar
    sum: jnp.ndarray  # f32[size]
    sumsq: jnp.ndarray  # f32[size]
    mean: jnp.ndarray  # f32[size]
    std: jnp.ndarray  # f32[size]


def init(size: int) -> NormalizerState:
    zeros = jnp.zeros((size,), jnp.float32)
    return NormalizerState(
        steps=jnp.zeros((), jnp.float32),
        sum=zeros,
        sumsq=zeros,
        mean=zeros,
        std=zeros,
    )


def update(
    state: NormalizerState,
    batch: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> NormalizerState:
    """Folds a batch ([..., size]) into the statistics.

    With ``axis_name`` set the increments are summed over that mesh axis
    first (the reference's cross-replica all_reduce, normalizer.py:105-109).
    """
    flat = batch.astype(jnp.float32).reshape(-1, batch.shape[-1])
    count = jnp.asarray(flat.shape[0], jnp.float32)
    s = jnp.sum(flat, axis=0)
    sq = jnp.sum(jnp.square(flat), axis=0)
    if axis_name is not None:
        count, s, sq = jax.lax.psum((count, s, sq), axis_name)
    steps = state.steps + count
    total = state.sum + s
    totalsq = state.sumsq + sq
    mean = total / steps
    std = jnp.sqrt(jnp.maximum(0.0, totalsq / steps - jnp.square(mean)))
    return NormalizerState(
        steps=steps, sum=total, sumsq=totalsq, mean=mean, std=std
    )


def normalize(
    state: NormalizerState,
    x: jnp.ndarray,
    eps: float = 0.001,
    clip_range: Tuple[float, float] = (-5.0, 5.0),
) -> jnp.ndarray:
    """``clip((x - mean) / (std + eps))`` — non-differentiable in stats."""
    state = jax.lax.stop_gradient(state)
    out = (x.astype(jnp.float32) - state.mean) / (state.std + eps)
    return jnp.clip(out, clip_range[0], clip_range[1])


def _flat_width(observation) -> int:
    leaves = jax.tree.leaves(observation)
    return sum(int(leaf.shape[-1]) for leaf in leaves)


def normalize_observation(state: NormalizerState, observation, eps=0.001,
                          clip_range=(-5.0, 5.0)):
    """Normalizes a (possibly dict) observation leaf-wise along one concat.

    Matches the wrapper's concat-then-split (normalizer.py:165-172): the
    statistics are tracked over the concatenation of all flattened leaves.
    """
    leaves, treedef = jax.tree_util.tree_flatten(observation)
    widths = [leaf.shape[-1] for leaf in leaves]
    concat = jnp.concatenate(
        [leaf.astype(jnp.float32) for leaf in leaves], axis=-1
    )
    normalized = normalize(state, concat, eps, clip_range)
    pieces = jnp.split(normalized, np_cumsum_exclusive(widths), axis=-1)
    return jax.tree_util.tree_unflatten(treedef, pieces)


def np_cumsum_exclusive(widths):
    out, acc = [], 0
    for w in widths[:-1]:
        acc += w
        out.append(acc)
    return out


def update_from_observation(
    state: NormalizerState, observation, axis_name: Optional[str] = None
) -> NormalizerState:
    leaves = jax.tree.leaves(observation)
    concat = jnp.concatenate(
        [leaf.astype(jnp.float32) for leaf in leaves], axis=-1
    )
    return update(state, concat, axis_name)
