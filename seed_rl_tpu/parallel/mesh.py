"""Device-mesh construction for multi-chip / multi-host scale-out.

Replaces the reference's TPU topology carve-up (common/utils.py:53-116:
``init_learner_multi_host`` splits cores into training vs inference sets and
builds two ``tf.distribute`` strategies). In the on-device design there is no
inference/training split — the same SPMD program does both — so the mesh is a
single logical factorization of all devices:

- ``replica``: data parallelism — envs, rollouts and loss terms are sharded;
  gradients are reduced over ICI by XLA (no hand-written NCCL/gRPC).
- ``model`` (optional): reserved for tensor-parallel sharding of large
  policy/value networks (the reference never needed it; RL nets are small).

Multi-host: ``jax.devices()`` already spans all hosts under ``jax.distributed``
initialization, so the same mesh covers pods; per-host env sharding falls out
of placing env-state shards on local devices.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_replicas: Optional[int] = None,
    model_parallelism: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=("replica", "model"),
) -> Mesh:
    """Builds a (replica, model) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if num_replicas is None:
        num_replicas = len(devices) // model_parallelism
    n = num_replicas * model_parallelism
    assert n <= len(devices), (num_replicas, model_parallelism, len(devices))
    grid = np.asarray(devices[:n]).reshape(num_replicas, model_parallelism)
    return Mesh(grid, axis_names)


def init_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initializes JAX distributed so ``jax.devices()`` spans all hosts.

    The multi-host equivalent of the reference's ``init_learner_multi_host``
    (common/utils.py:53-98): after this, ``make_mesh()`` builds a global mesh
    over every chip in the pod slice, per-host env shards live on local
    devices, and gradient reductions ride ICI. On single-host setups this is
    a no-op.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
