"""Opt-in on-device contract checks for the fused (jitted) paths.

SURVEY §5 (race detection): the reference guards its data plane with
host-side runtime assertions — duplicate-env-id checks in UnrollStore/
Aggregator (/root/reference/common/utils.py:173-176, 530-540), dying-env
duplicate detection (:1045-1058), single-writer replay contracts
(:263-265). This framework's host/remote paths keep those as Python
asserts; the fused on-device paths run everything inside one ``jit`` where
a Python assert cannot see runtime values. This module provides the
device-side equivalent via ``jax.experimental.checkify``:

- ``check(pred, msg)`` — a contract point. Compiles to NOTHING unless
  debug asserts are enabled (the predicate is never materialized), so hot
  paths carry zero cost in production.
- ``enable()`` / ``--debug_asserts`` — turns the contract points into
  real checkified checks.
- ``checkify_jit(fn)`` — drop-in for ``jax.jit`` at driver level: with
  asserts enabled it functionalizes the user checks and throws
  ``JaxRuntimeError`` with the failing contract's message; disabled, it is
  exactly ``jax.jit(fn)``.

Contract points live in ``replay.py`` (insert-priority validity, sampling
from a non-empty buffer) — the fused-path state machine whose corruption
is otherwise silent (a NaN priority poisons the categorical sampler but
every downstream op still returns numbers).
"""

import contextvars
import functools
from typing import Any, Callable

_ENABLED = False

# True only while a function wrapped by ``checkify_jit`` is being traced.
# ``check()`` consults this so that a contract point traced by a PLAIN
# ``jax.jit`` (DistributedLearner multichip path, --run_mode=profile)
# never emits a checkify primitive there — emitting one would crash at
# lowering time ("Cannot abstractly evaluate a checkify.check"), and that
# error surfaces outside any try/except around the emit site. Tracing is
# synchronous, so a dynamic flag scoped to the traced call is exact.
_IN_CHECKIFY: contextvars.ContextVar = contextvars.ContextVar(
    "seed_rl_tpu_in_checkify", default=False
)


def enable(on: bool = True) -> None:
    """Globally enable contract checks (call before tracing/jitting)."""
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


_WARNED_UNFUNCTIONALIZED = False


def check(pred: Any, msg: str, **fmt_kwargs) -> None:
    """Contract point: no-op (traced away) unless debug asserts are on.

    Active checks require the enclosing program to be compiled through
    ``checkify_jit``. When a plain ``jax.jit`` path (DistributedLearner,
    --run_mode=profile) traces an enabled check, we degrade to a no-op
    with a one-time warning instead of emitting a checkify primitive that
    plain jit cannot lower, so --debug_asserts guards the single-host
    fused loops without crashing the rest.
    """
    if _ENABLED:
        if _IN_CHECKIFY.get():
            from jax.experimental import checkify

            checkify.check(pred, msg, **fmt_kwargs)
        else:
            global _WARNED_UNFUNCTIONALIZED
            if not _WARNED_UNFUNCTIONALIZED:
                _WARNED_UNFUNCTIONALIZED = True
                import warnings

                warnings.warn(
                    "--debug_asserts: a contract check was traced inside "
                    "a non-checkified jit (multi-chip/profile path); the "
                    "check is skipped there. Contract checks are active "
                    "on the checkify_jit-compiled single-host loops."
                )


def checkify_jit(fn: Callable, **jit_kwargs) -> Callable:
    """``jax.jit`` that surfaces ``check`` failures as raised errors."""
    import jax

    if not _ENABLED:
        return jax.jit(fn, **jit_kwargs)
    from jax.experimental import checkify

    @functools.wraps(fn)
    def traced(*args, **kwargs):
        token = _IN_CHECKIFY.set(True)
        try:
            return fn(*args, **kwargs)
        finally:
            _IN_CHECKIFY.reset(token)

    checked = jax.jit(
        checkify.checkify(traced, errors=checkify.user_checks), **jit_kwargs
    )

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
