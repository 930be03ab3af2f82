"""Learner-config validation and learner→actor config push.

Parity with /root/reference/common/utils.py:
- ``validate_learner_config`` (:989-1002): checks env-count divisibility and
  auto-tunes the inference batch size to
  ``max(env_batch_size, num_envs // (2 * num_hosts))`` — small enough that
  two full batches are in flight per host (latency hiding), large enough to
  amortize dispatch.
- ``serialize_config`` / ``apply_config`` (:1074-1110): the learner is the
  source of configuration truth; external actors fetch the learner's
  non-default settings at (re)connect time and adopt them
  (reference ``update_config``, called at actor.py:75). Here the payload is
  a plain dict of the dataclass fields that differ from their defaults —
  no pickled absl flags.
"""

import dataclasses
from typing import Any, Dict, Optional


def validate_learner_config(
    num_envs: int,
    env_batch_size: int,
    inference_batch_size: Optional[int] = None,
    num_hosts: int = 1,
) -> int:
    """Validates sizes; returns the (possibly auto-tuned) inference batch.

    Mirrors common/utils.py:989-1002 exactly: ``inference_batch_size ==
    -1``/None selects ``max(env_batch_size, num_envs // (2 * num_hosts))``;
    the batch must be an exact multiple of the actor-side env batch (so
    actor batches pack evenly) and may never exceed the per-host env count.
    """
    assert num_envs > 0, "num_envs must be positive"
    assert env_batch_size > 0, "env_batch_size must be positive"
    if inference_batch_size is None or inference_batch_size == -1:
        inference_batch_size = max(env_batch_size, num_envs // (2 * num_hosts))
    assert inference_batch_size > 0
    assert inference_batch_size % env_batch_size == 0, (
        f"Learner-side batch size (={inference_batch_size}) must be exact "
        f"multiple of the actor-side batch size (={env_batch_size})."
    )
    assert num_envs >= inference_batch_size * num_hosts, (
        "Inference batch size is bigger than the number of environments."
    )
    return inference_batch_size


def serialize_config(config: Any) -> Dict[str, Any]:
    """Non-default fields of a dataclass config (utils.py:1074-1090)."""
    assert dataclasses.is_dataclass(config), config
    out = {}
    for field in dataclasses.fields(config):
        value = getattr(config, field.name)
        default = (
            field.default_factory()
            if field.default_factory is not dataclasses.MISSING
            else field.default
        )
        if value != default:
            out[field.name] = value
    return out


def apply_config(config: Any, overrides: Dict[str, Any]) -> Any:
    """Returns ``config`` with the pushed overrides applied
    (actor-side ``update_config``, utils.py:1093-1110)."""
    assert dataclasses.is_dataclass(config), config
    known = {f.name for f in dataclasses.fields(config)}
    unknown = set(overrides) - known
    assert not unknown, f"unknown config keys pushed: {sorted(unknown)}"
    return dataclasses.replace(config, **overrides)
