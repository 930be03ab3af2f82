"""Frame-count action points + in-memory learner snapshots.

Parity with /root/reference/agents/policy_gradient/learner.py:
- count-based action points on a linspace of total frames for checkpoints,
  saved-model exports and in-memory snapshots (:436-471): each action fires
  exactly once, the first time the cumulative frame count reaches its mark;
  marks are ``linspace(0, total_frames, n+1)[1:]`` so the final mark lands
  on the last frame.
- ``LearnerState`` in-memory snapshots (:47-66, 587-615): a host-resident
  copy of everything needed to warm-start another learner without touching
  disk — usable as ``init_checkpoint`` (:666-679 accepts a path or an
  in-memory state).
"""

from typing import Any, Dict, List, NamedTuple

import jax
import numpy as np


class ActionPointSchedule:
    """Fires named actions at linspace frame marks, each exactly once."""

    def __init__(self, total_frames: int, counts: Dict[str, int]):
        self._marks: Dict[str, np.ndarray] = {}
        self._next: Dict[str, int] = {}
        for name, n in counts.items():
            if n > 0:
                self._marks[name] = np.linspace(0, total_frames, n + 1)[1:]
                self._next[name] = 0

    def due(self, frames: int) -> List[str]:
        """Actions whose next mark is <= ``frames`` (consumes the marks).

        Fires once PER crossed mark: if one driver call jumps several marks
        the action repeats, so the requested count of
        checkpoints/exports/snapshots is honoured (the reference instead
        paces its minimize loop to stop at each point,
        policy_gradient/learner.py:549-582 — same contract).
        """
        fired = []
        for name, marks in self._marks.items():
            i = self._next[name]
            while i < len(marks) and frames >= marks[i]:
                fired.append(name)
                i += 1
            self._next[name] = i
        return fired


class LearnerState(NamedTuple):
    """Host-resident snapshot of a learner's training variables."""

    params: Any
    obs_norm: Any
    norm_state: Any
    opt_state: Any
    step: Any
    frames: int


def snapshot_ppo_state(state, frames: int) -> LearnerState:
    """Copies a ``PPOTrainState``'s training variables to host memory."""
    host = jax.device_get(
        (state.params, state.obs_norm, state.norm_state, state.opt_state,
         state.step)
    )
    return LearnerState(*host, frames=frames)


def restore_ppo_state(state, snapshot: LearnerState):
    """Warm-starts a ``PPOTrainState`` from an in-memory snapshot.

    Rollout/episode-stat state is NOT restored (fresh envs), matching the
    reference where a warm start only carries agent/optimizer variables.
    """
    return state._replace(
        params=jax.tree.map(jax.numpy.asarray, snapshot.params),
        obs_norm=jax.tree.map(jax.numpy.asarray, snapshot.obs_norm),
        norm_state=jax.tree.map(jax.numpy.asarray, snapshot.norm_state),
        opt_state=jax.tree.map(jax.numpy.asarray, snapshot.opt_state),
        step=jax.numpy.asarray(snapshot.step),
    )
