"""Distributed (sharded) learner execution over a device mesh.

The TPU-native replacement for the reference's distribution machinery
(SURVEY.md §2.2 "Parallelism" table): instead of TPUStrategy replica
variables, ON_READ temp-grad tricks and cross-strategy weight broadcasts
(agents/vtrace/learner.py:249-280, policy_gradient/learner.py:733-769), the
train step is a single *global-array* program: env batches carry a
``NamedSharding`` over the ``replica`` mesh axis, parameters are replicated,
and XLA's SPMD partitioner inserts the gradient all-reduce over ICI on its
own. There is exactly one copy of the program and zero hand-written
collectives.

Sharding rules (by state-tree path):
- anything under ``rollout`` except the PRNG key: env-batch sharded
  (axis 0; ``carry_timesteps`` are time-major so axis 1),
- ``stats.return_acc``: env-batch sharded,
- replay buffers (``replay.*``, added by off-policy agents): item-sharded,
- everything else (params, opt state, counters, scalar windows): replicated.
"""

import functools
import re
from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if hasattr(entry, "name"):
            parts.append(str(entry.name))
        elif hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def state_pspecs(
    state_shape: Any, axis_name: str = "replica", axis_size: int = 1
) -> Any:
    """PartitionSpec pytree for a learner state, by path rules above."""

    def divisible(leaf, axis=0):
        return leaf.ndim > axis and leaf.shape[axis] % max(axis_size, 1) == 0

    def rule(path, leaf):
        p = _path_str(path)
        if re.search(r"(^|/)rollout/", p) or p == "rollout":
            # Scalar PRNG keys are replicated; per-env key arrays ([B, 2])
            # shard like any other per-env leaf.
            if ("/rng" in p or p.endswith("rng")) and leaf.ndim <= 1:
                return P()
            if "carry_timesteps" in p:
                # [T, B, ...] — batch is axis 1.
                return P(None, axis_name) if divisible(leaf, 1) else P()
            return P(axis_name) if divisible(leaf) else P()
        if re.search(r"(^|/)(eval_)?stats/return_acc", p):
            return P(axis_name) if divisible(leaf) else P()
        if re.search(r"(^|/)replay/", p):
            if leaf.ndim == 0 or "rng" in p or not divisible(leaf):
                return P()
            return P(axis_name)
        return P()

    return jax.tree_util.tree_map_with_path(rule, state_shape)


class DistributedLearner:
    """Runs any fused-step learner (V-trace/PPO/R2D2/SAC) over a mesh.

    The wrapped learner must expose ``init(rng)``, ``train_step(state)`` and
    ``train_many(state, n)`` as pure functions of global-shaped arrays, with
    ``num_envs`` divisible by the mesh's replica count.
    """

    def __init__(self, learner, mesh: Mesh, axis_name: str = "replica"):
        self.learner = learner
        self.mesh = mesh
        self.axis_name = axis_name
        num_replicas = mesh.shape[axis_name]
        num_envs = learner.engine.env.num_envs
        assert num_envs % num_replicas == 0, (
            f"num_envs={num_envs} must divide over {num_replicas} replicas"
        )
        state_shape = jax.eval_shape(learner.init, jax.random.PRNGKey(0))
        self._pspecs = state_pspecs(
            state_shape, axis_name, mesh.shape[axis_name]
        )
        self._shardings = jax.tree.map(
            lambda p: NamedSharding(mesh, p),
            self._pspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
        self._init = jax.jit(learner.init, out_shardings=self._shardings)
        self._step = jax.jit(
            learner.train_step,
            in_shardings=(self._shardings,),
            out_shardings=(self._shardings, None),
        )
        self._many_cache = {}
        self._warmup = None
        if hasattr(learner, "warmup_step"):
            # Replay agents: sharded rollout+insert to fill the buffer.
            self._warmup = jax.jit(
                learner.warmup_step,
                in_shardings=(self._shardings,),
                out_shardings=self._shardings,
            )

    # Marks pre-jitted entry points for generic learner loops.
    jit_compiled = True

    @property
    def shardings(self):
        return self._shardings

    @property
    def frames_per_step(self):
        return self.learner.frames_per_step

    @property
    def engine(self):
        return self.learner.engine

    @property
    def config(self):
        return self.learner.config

    def init(self, rng):
        return self._init(rng)

    def warmup_step(self, state):
        assert self._warmup is not None
        return self._warmup(state)

    def train_step(self, state):
        return self._step(state)

    def train_many(self, state, num_steps: int):
        if num_steps not in self._many_cache:
            self._many_cache[num_steps] = jax.jit(
                functools.partial(
                    self.learner.train_many, num_steps=num_steps
                ),
                in_shardings=(self._shardings,),
                out_shardings=(self._shardings, None),
            )
        return self._many_cache[num_steps](state)
