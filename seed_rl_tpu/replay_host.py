"""Host-RAM prioritized replay at reference scale (SURVEY §7 "hard parts").

The reference keeps its R2D2 replay buffer in learner host RAM — ~100k
unrolls of 120 x 84x84 uint8 frames is >85 GB, far beyond any HBM
(/root/reference/agents/r2d2/learner.py:387-468 create_dataset;
gcp/train_atari.sh:28-33 notes >104 GB RAM). `seed_rl_tpu.replay` keeps the
buffer in HBM for fully-fused small/medium configs; this module is the
reference-scale backend:

- storage is a pytree of preallocated host numpy arrays `[size, ...]` —
  uint8 frames stay uint8 end to end (no float blow-up in RAM or on the
  wire),
- FIFO wrap-around insertion and priority^exponent categorical sampling
  with max-normalized importance weights match ``PrioritizedReplay``
  (reference common/utils.py:279-356) in distribution,
- sampled batches are gathered on host and shipped to device via
  ``jax.device_put``; a one-deep prefetch thread overlaps the gather + H2D
  of batch k+1 with the device training step k (the async-H2D half of the
  pinned-host-ring design; the reference gets the same overlap from its
  tf.data thread, learner.py:435-437),
- priorities live on host (float64 cumsum for exact categorical sampling);
  ``update_priorities`` consumes the device priorities of the just-trained
  batch (same post-step write-back as reference learner.py:883-885).

Thread contract: like the reference buffer (common/utils.py:263-265), all
mutating calls must come from one driver thread; the prefetch thread only
reads under the internal lock.
"""

import os
import pickle
import threading
from typing import Any, Tuple

import numpy as np


class HostReplayBuffer:
    """Prioritized FIFO replay in host RAM with device-bound sampling."""

    def __init__(
        self,
        size: int,
        importance_sampling_exponent: float,
        seed: int = 0,
    ):
        self.size = int(size)
        self.importance_sampling_exponent = importance_sampling_exponent
        self._rng = np.random.default_rng(seed)
        self._storage = None  # list of numpy arrays, one per leaf
        self._treedef = None  # pytree structure of inserted items
        self._priorities = np.zeros((self.size,), np.float64)
        self._insert_index = 0
        self._num_inserted = 0  # capped at size
        self._lock = threading.Lock()
        # One-deep prefetch pipeline (sample k+1 overlaps train k).
        self._prefetch_thread = None
        self._prefetch_result = None

    @property
    def num_inserted(self) -> int:
        return self._num_inserted

    def insert(self, items, priorities) -> np.ndarray:
        """FIFO insert of a batch of items (pytree of [batch, ...] arrays).

        Accepts numpy or device arrays (device arrays are pulled to host).
        Returns the inserted indices.
        """
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(items)
        leaves = [np.asarray(x) for x in leaves]
        priorities = np.asarray(priorities, np.float64)
        batch = priorities.shape[0]
        assert batch <= self.size
        if self._storage is None:
            self._treedef = treedef
            self._storage = [
                np.zeros((self.size,) + tuple(leaf.shape[1:]), leaf.dtype)
                for leaf in leaves
            ]
        start = self._insert_index
        indices = (start + np.arange(batch)) % self.size
        with self._lock:
            for store, vals in zip(self._storage, leaves):
                if start + batch <= self.size:
                    store[start:start + batch] = vals
                else:
                    head = self.size - start
                    store[start:] = vals[:head]
                    store[:batch - head] = vals[head:]
            self._priorities[indices] = priorities
            self._insert_index = (start + batch) % self.size
            self._num_inserted = min(self._num_inserted + batch, self.size)
        return indices.astype(np.int64)

    def _sample_host(
        self, num_samples: int, priority_exp: float
    ) -> Tuple[np.ndarray, np.ndarray, list]:
        """Categorical draw + host gather. Called under the lock."""
        limit = self._num_inserted
        assert limit > 0, "sampling from an empty replay buffer"
        if priority_exp == 0:
            indices = self._rng.integers(0, limit, size=num_samples)
            weights = np.ones((num_samples,), np.float32)
        else:
            p = self._priorities[:limit] ** priority_exp
            total = p.sum()
            cdf = np.cumsum(p)
            u = self._rng.random(num_samples) * total
            indices = np.searchsorted(cdf, u, side="right")
            indices = np.minimum(indices, limit - 1)
            probs = p[indices] / total
            weights = (
                (1.0 / limit) / np.maximum(probs, 1e-30)
            ) ** self.importance_sampling_exponent
            weights = (weights / weights.max()).astype(np.float32)
        gathered = [store[indices] for store in self._storage]
        return indices.astype(np.int64), weights, gathered

    def sample(self, num_samples: int, priority_exp: float, device_put=True):
        """Returns (indices i64[n], weights f32[n], items pytree [n, ...]).

        Items are placed on device unless ``device_put=False``.
        """
        import jax

        with self._lock:
            indices, weights, gathered = self._sample_host(
                num_samples, priority_exp
            )
        if device_put:
            gathered = [jax.device_put(g) for g in gathered]
        items = jax.tree_util.tree_unflatten(self._treedef, gathered)
        return indices, weights, items

    def sample_async(self, num_samples: int, priority_exp: float):
        """Start gathering + H2D of the next batch on the prefetch thread."""
        assert self._prefetch_thread is None, "one prefetch in flight max"
        result = {}

        def work():
            result["value"] = self.sample(num_samples, priority_exp)

        self._prefetch_result = result
        self._prefetch_thread = threading.Thread(target=work, daemon=True)
        self._prefetch_thread.start()

    def wait_sample(self):
        """Blocks on the in-flight ``sample_async`` and returns its result."""
        assert self._prefetch_thread is not None
        self._prefetch_thread.join()
        value = self._prefetch_result["value"]
        self._prefetch_thread = None
        self._prefetch_result = None
        return value

    def update_priorities(self, indices, priorities) -> None:
        priorities = np.asarray(priorities, np.float64)
        with self._lock:
            self._priorities[np.asarray(indices)] = priorities

    def nbytes(self) -> int:
        """Current host-RAM footprint of the storage arrays."""
        if self._storage is None:
            return 0
        return int(sum(s.nbytes for s in self._storage))

    # -- Persistence (opt-in; the reference has no equivalent — its replay
    # -- is RAM-only and a learner restart refills from current-policy data,
    # -- gcp/train_atari.sh:28-33. Beating that restart cost is the point.)

    def save(self, directory: str) -> None:
        """Writes the full buffer state under ``directory``.

        Layout: one streamed ``.npy`` per storage leaf (``np.save`` handles
        multi-GB uint8 arrays without a copy), ``meta.npz`` with
        priorities/cursors, and the pickled item treedef. The write goes to
        ``directory + '.tmp'`` first and is renamed into place, so a crash
        mid-save leaves the previous snapshot intact (possibly parked at
        ``<dir>.old``, which restore() falls back to).

        Cost note: the save runs synchronously in the caller (the
        training driver) and holds the lock for the disk write — at soak
        scale (~83 GiB) that is minutes of stalled training per snapshot.
        Pick ``--save_checkpoint_secs`` accordingly; the reference has no
        persistence at any cost (RAM-only buffer).
        """
        assert self._prefetch_thread is None, "quiesce prefetch before save"
        tmp = directory + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp)
        with self._lock:
            np.savez(
                os.path.join(tmp, "meta.npz"),
                priorities=self._priorities,
                insert_index=self._insert_index,
                num_inserted=self._num_inserted,
                size=self.size,
                num_leaves=0 if self._storage is None else len(
                    self._storage
                ),
            )
            if self._storage is not None:
                with open(os.path.join(tmp, "treedef.pkl"), "wb") as f:
                    pickle.dump(self._treedef, f)
                for i, leaf in enumerate(self._storage):
                    np.save(os.path.join(tmp, f"leaf_{i}.npy"), leaf)
        # Two renames instead of delete-then-rename: a crash at any point
        # leaves either the old snapshot (still named ``directory`` or
        # parked at ``.old``) or the complete new one — never nothing.
        old = directory + ".old"
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)
        if os.path.exists(directory):
            os.rename(directory, old)
        os.rename(tmp, directory)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)

    def restore(self, directory: str) -> bool:
        """Loads a ``save()`` snapshot; returns False if none exists."""
        meta_path = os.path.join(directory, "meta.npz")
        if not os.path.exists(meta_path):
            # A crash between save()'s two renames parks the previous
            # snapshot at ``<dir>.old`` — fall back to it.
            old = directory + ".old"
            if os.path.exists(os.path.join(old, "meta.npz")):
                directory = old
                meta_path = os.path.join(old, "meta.npz")
            else:
                return False
        assert self._prefetch_thread is None
        meta = np.load(meta_path)
        if int(meta["size"]) != self.size:
            raise ValueError(
                f"replay snapshot size {int(meta['size'])} != configured "
                f"--replay_buffer_size {self.size}; use a matching size or "
                "a fresh replay directory"
            )
        num_leaves = int(meta["num_leaves"])
        with self._lock:
            self._priorities = meta["priorities"].astype(np.float64)
            self._insert_index = int(meta["insert_index"])
            self._num_inserted = int(meta["num_inserted"])
            if num_leaves:
                with open(os.path.join(directory, "treedef.pkl"),
                          "rb") as f:
                    self._treedef = pickle.load(f)
                self._storage = [
                    np.load(os.path.join(directory, f"leaf_{i}.npy"))
                    for i in range(num_leaves)
                ]
        return True
