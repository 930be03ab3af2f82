"""Config validation + learner→actor config push tests
(reference common/utils.py:989-1110 semantics)."""

import dataclasses

import pytest

from seed_rl_tpu.utils.config import (
    apply_config,
    serialize_config,
    validate_learner_config,
)


def test_inference_batch_size_auto_tune():
    # max(env_batch_size, num_envs // (2 * num_hosts)) — utils.py:997-1000.
    assert validate_learner_config(640, 20, None, num_hosts=1) == 320
    assert validate_learner_config(640, 20, -1, num_hosts=4) == 80
    # Small fleets fall back to env_batch_size.
    assert validate_learner_config(40, 20, None, num_hosts=2) == 20
    # Explicit values pass through when they pack actor batches evenly.
    assert validate_learner_config(640, 20, 60) == 60


def test_validate_learner_config_rejects_bad_sizes():
    with pytest.raises(AssertionError):
        # Not an exact multiple of the actor-side env batch
        # (reference common/utils.py:997-1000).
        validate_learner_config(640, 20, 64)
    with pytest.raises(AssertionError):
        validate_learner_config(64, 16, 128)  # batch larger than fleet


@dataclasses.dataclass(frozen=True)
class _Cfg:
    unroll_length: int = 20
    num_action_repeats: int = 1
    gamma: float = 0.99


def test_serialize_config_only_non_defaults():
    cfg = _Cfg(unroll_length=80)
    assert serialize_config(cfg) == {"unroll_length": 80}
    assert serialize_config(_Cfg()) == {}


def test_apply_config_round_trip_and_unknown_keys():
    pushed = serialize_config(_Cfg(unroll_length=80, gamma=0.997))
    adopted = apply_config(_Cfg(), pushed)
    assert adopted == _Cfg(unroll_length=80, gamma=0.997)
    with pytest.raises(AssertionError):
        apply_config(_Cfg(), {"bogus": 1})


def test_actor_loop_adopts_pushed_config():
    """actor_loop fetches client.get_config before building envs."""
    import numpy as np

    from seed_rl_tpu.runtime.actor import actor_loop
    from seed_rl_tpu.types import EnvOutput

    adopted = {}

    class _FakeEnv:
        num_envs = 2

        def reset(self):
            return EnvOutput(
                reward=np.zeros((2,), np.float32),
                done=np.zeros((2,), bool),
                observation=np.zeros((2, 3), np.float32),
                abandoned=np.zeros((2,), bool),
                episode_step=np.zeros((2,), np.int32),
            )

        def step(self, actions):
            return self.reset()

        def close(self):
            pass

    class _FakeClient:
        def get_config(self):
            return {"unroll_length": 80}

        def inference(self, env_id, run_id, row, raw_reward):
            return np.zeros((), np.int32)

    actor_loop(
        _FakeEnv,
        _FakeClient(),
        num_steps=2,
        apply_config_fn=adopted.update,
    )
    assert adopted == {"unroll_length": 80}


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
