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
        try:
            restored = self._mngr.restore(
                self._mngr.latest_step(),
                args=ocp.args.StandardRestore(state),
            )
        except ValueError as exc:
            restored = self._try_migrate(state)
            if restored is None:
                raise ValueError(
                    "restore-on-start failed: the checkpoint in the logdir "
                    "has a different train-state structure than this run "
                    "(config/optimizer change?). Use a fresh --logdir, "
                    "delete the stale ckpt/ directory, or warm-start params "
                    "only via --init_checkpoint. "
                    f"Original error: {exc}"
                ) from exc
        self._last_save = time.time()
        return restored

    def _try_migrate(self, state: Any) -> Optional[Any]:
        """Retry a failed restore after applying legacy key renames.

        Checkpoints saved before the ImpalaDeep torso scope was pinned to
        ``"torso"`` carry the flax auto-name ``"ImpalaResNetTorso_0"``
        (models/resnets.py). Load the stored tree at its own shapes, apply
        the rename map, and repack into the current state structure;
        return None if the trees still do not line up.
        """
        import jax

        try:
            step = self._mngr.latest_step()
            meta = self._mngr.item_metadata(step)
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta.tree
            )
            raw = self._mngr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
            return _repack_saved(state, _apply_key_renames(raw))
        except (ValueError, KeyError, TypeError, IndexError):
            return None

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


# Train-state fields that are environment-independent: exactly what a warm
# start carries over (the reference's --init_checkpoint restores agent
# variables, not actor/env state — agents/vtrace/learner.py:287-289).
WARM_START_FIELDS = (
    "params",
    "target_net_params",
    "target_params",
    "opt_state",
    "norm_state",
    "obs_norm",
    "step",
)


# Module-scope renames applied when a plain restore fails on a structure
# mismatch: old stored name -> current name. The only entry so far is the
# ImpalaDeep torso scope pin (models/resnets.py: flax auto-name
# "ImpalaResNetTorso_0" -> fixed "torso" so remat and stored-activation
# nets share one param tree).
_LEGACY_KEY_RENAMES = {"ImpalaResNetTorso_0": "torso"}


def _apply_key_renames(tree: Any) -> Any:
    """Recursively renames dict keys per ``_LEGACY_KEY_RENAMES``."""
    if isinstance(tree, dict):
        return {
            _LEGACY_KEY_RENAMES.get(k, k): _apply_key_renames(v)
            for k, v in tree.items()
        }
    if isinstance(tree, (list, tuple)):
        return type(tree)(_apply_key_renames(v) for v in tree)
    return tree


def _repack_saved(target: Any, saved: Any) -> Any:
    """Rebuilds ``target``'s pytree structure from a restored nested-dict.

    Orbax stores NamedTuples as dicts keyed by field name; walking the
    target structure by name keeps leaves aligned regardless of dict key
    ordering.
    """
    if hasattr(target, "_fields"):  # NamedTuple
        return type(target)(
            *(
                _repack_saved(getattr(target, f), saved[f])
                for f in target._fields
            )
        )
    if isinstance(target, dict):
        return {k: _repack_saved(v, saved[k]) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return type(target)(
            _repack_saved(v, saved[i]) for i, v in enumerate(target)
        )
    return saved


def restore_from(path: str, state: Any, warm_start_only: bool = True) -> Any:
    """Warm-start restore from an explicit checkpoint directory.

    With ``warm_start_only`` (default) only the env-independent fields are
    read (params/optimizer/normalizer/step); rollout, replay and episode
    stats keep their freshly-initialized values, so a warm start works even
    when ``num_envs`` or buffer sizes differ from the source run (matching
    the reference's --init_checkpoint, which restores agent variables only).

    Note: orbax still materializes the full stored tree during the restore
    (its partial-restore PLACEHOLDER path rejects the empty-tuple leaves in
    rollout state), so warm-starting from a checkpoint with a huge replay
    buffer temporarily costs that buffer's host memory/IO. Agent params are
    tiny; if this matters, checkpoint on-policy learners for warm starts.
    """
    import jax

    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(path, "ckpt")),
        item_handlers={"default": ocp.StandardCheckpointHandler()},
    )
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No checkpoint under {path}")
    if warm_start_only and hasattr(state, "_fields"):
        # Restore the full stored tree at its OWN stored shapes (from
        # checkpoint metadata), then copy over only the warm-start fields.
        meta = mngr.item_metadata(step)["default"]
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta.tree
        )
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                default=ocp.args.StandardRestore(template)
            ),
        )["default"]
        restored = _apply_key_renames(restored)
        keep = [f for f in state._fields if f in WARM_START_FIELDS]
        result = state._replace(
            **{
                f: _repack_saved(getattr(state, f), restored[f])
                for f in keep
            }
        )
    else:
        result = mngr.restore(step, args=ocp.args.StandardRestore(state))
    mngr.close()
    return result
