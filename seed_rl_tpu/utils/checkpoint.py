"""Orbax-based checkpointing with the reference's save/restore semantics.

Mirrors /root/reference/agents/vtrace/learner.py:286-296: keep the latest
checkpoint, time-based cadence (``save_checkpoint_secs``), restore-on-start
for preemption recovery, and ``init_checkpoint`` warm starts.
"""

import os
import time
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: Optional[str],
        save_checkpoint_secs: float = 1800.0,
        max_to_keep: int = 1,
        keep_period_hours: float = 6.0,
        init_checkpoint: Optional[str] = None,
    ):
        self._mngr = None
        self._save_secs = save_checkpoint_secs
        # Warm-start source, used only when there is nothing to resume from
        # (reference --init_checkpoint, agents/vtrace/learner.py:287-289).
        self._init_checkpoint = init_checkpoint
        # Force an immediate save of the initial state, like the reference's
        # `last_ckpt_time = 0`.
        self._last_save = 0.0
        if directory:
            directory = os.path.abspath(directory)
            options = ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                keep_period=None,
            )
            self._mngr = ocp.CheckpointManager(
                os.path.join(directory, "ckpt"), options=options
            )

    def restore_or(self, state: Any) -> Any:
        """Restore the latest checkpoint if present, else return ``state``."""
        if self._mngr is None or self._mngr.latest_step() is None:
            if self._init_checkpoint:
                return restore_from(self._init_checkpoint, state)
            return state
        restored = self._mngr.restore(
            self._mngr.latest_step(),
            args=ocp.args.StandardRestore(state),
        )
        self._last_save = time.time()
        return restored

    def maybe_save(self, step: int, state: Any, force: bool = False) -> bool:
        if self._mngr is None:
            return False
        now = time.time()
        if not force and now - self._last_save < self._save_secs:
            return False
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        self._last_save = now
        return True

    def close(self):
        if self._mngr is not None:
            self._mngr.wait_until_finished()
            self._mngr.close()


def restore_from(path: str, state: Any) -> Any:
    """Warm-start restore from an explicit checkpoint directory."""
    mngr = ocp.CheckpointManager(os.path.abspath(os.path.join(path, "ckpt")))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No checkpoint under {path}")
    restored = mngr.restore(step, args=ocp.args.StandardRestore(state))
    mngr.close()
    return restored
