"""Host-side per-env unroll accumulation for external actors.

Numpy equivalent of the reference's ``UnrollStore`` (common/utils.py:
119-257): a per-env ring of ``overlap + unroll_length + 1`` timesteps;
``append`` scatters one timestep for a batch of env ids and returns
completed unrolls; completed rows keep their last ``overlap + 1`` timesteps
(burn-in carryover, utils.py:240-256); ``reset`` re-zeroes restarted envs.
Used only on the external-actor path — on-device envs build unrolls directly
inside the rollout scan.
"""

from typing import Any, List, Tuple

import numpy as np


class HostUnrollStore:
    def __init__(
        self,
        num_envs: int,
        unroll_length: int,
        timestep_specs,
        num_overlapping_steps: int = 0,
    ):
        import jax

        self.num_envs = num_envs
        self.unroll_length = unroll_length
        self.overlap = num_overlapping_steps
        self._full_length = num_overlapping_steps + unroll_length + 1
        leaves, treedef = jax.tree_util.tree_flatten(timestep_specs)
        self._treedef = treedef
        self._buffers = [
            np.zeros(
                (num_envs, self._full_length) + tuple(l.shape),
                np.dtype(l.dtype),
            )
            for l in leaves
        ]
        # Index of the next slot to write, per env; starts after the
        # zero-initialized overlap prefix like the reference (:214-218).
        self._index = np.full(
            (num_envs,), num_overlapping_steps, np.int64
        )

    def append(self, env_ids: np.ndarray, timesteps) -> Tuple[np.ndarray, Any]:
        """Appends one timestep for each env id; returns completed unrolls.

        Args:
          env_ids: i64[batch] unique env ids.
          timesteps: pytree matching the specs, leaves [batch, ...].

        Returns:
          (completed_env_ids i64[k], unroll pytree with leaves
          [k, overlap+unroll_length+1, ...]).
        """
        import jax

        assert len(np.unique(env_ids)) == len(env_ids), (
            "duplicate env ids in append (reference asserts the same, "
            "utils.py:173-176)"
        )
        leaves = jax.tree_util.tree_leaves(timesteps)
        idx = self._index[env_ids]
        for buf, leaf in zip(self._buffers, leaves):
            buf[env_ids, idx] = leaf
        self._index[env_ids] = idx + 1

        completed_mask = self._index[env_ids] == self._full_length
        completed_ids = env_ids[completed_mask]
        if len(completed_ids) == 0:
            return completed_ids, None

        unroll_leaves = [buf[completed_ids].copy() for buf in self._buffers]
        # Carry the last overlap+1 timesteps to the front.
        keep = self.overlap + 1
        for buf in self._buffers:
            buf[completed_ids, :keep] = buf[completed_ids, -keep:]
        self._index[completed_ids] = keep
        return completed_ids, jax.tree_util.tree_unflatten(
            self._treedef, unroll_leaves
        )

    def reset(self, env_ids: np.ndarray):
        """Zero the rows of restarted envs (actor restart protocol)."""
        for buf in self._buffers:
            buf[env_ids] = 0
        self._index[env_ids] = self.overlap
