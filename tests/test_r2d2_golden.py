"""Golden test: R2D2 value math vs the reference's actual TF code.

Loads /root/reference/agents/r2d2/learner.py with its heavy imports
stubbed (grpc / common.utils are only used by the learner loop, not the
pure value functions) and compares, on random inputs:

- value_function_rescaling / inverse (learner.py:180-192),
- n_step_bellman_target incl. the end-of-episode tail logic
  (learner.py:195-255),
- compute_loss_and_priorities_from_agent_outputs — the sequence
  double-DQN loss and the eta-mixed priorities (learner.py:258-330) —

against seed_rl_tpu.ops.value_ops. Stronger than the ported
hand-computed cases in test_value_ops.py: this executes the reference's
own code.
"""

import collections
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_LEARNER = "/root/reference/agents/r2d2/learner.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_LEARNER), reason="reference checkout not present"
)

AgentOutput = collections.namedtuple("AgentOutput", "action q_values")
EnvOutput = collections.namedtuple("EnvOutput", "reward done")


def _load_reference_r2d2():
    if "reference_r2d2_learner" in sys.modules:
        return sys.modules["reference_r2d2_learner"]
    # Stub the learner-loop-only imports (grpc native op, common.utils).
    for name in [
        "seed_rl", "seed_rl.grpc", "seed_rl.common",
        "seed_rl.common.common_flags", "seed_rl.common.utils",
        "seed_rl.common.profiling",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["seed_rl"].grpc = sys.modules["seed_rl.grpc"]
    sys.modules["seed_rl"].common = sys.modules["seed_rl.common"]
    sys.modules["seed_rl.common"].utils = sys.modules["seed_rl.common.utils"]
    sys.modules["seed_rl.common"].common_flags = sys.modules[
        "seed_rl.common.common_flags"
    ]

    spec = importlib.util.spec_from_file_location(
        "reference_r2d2_learner", REF_LEARNER
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules["reference_r2d2_learner"] = module
    spec.loader.exec_module(module)
    from absl import flags

    if not flags.FLAGS.is_parsed():
        flags.FLAGS.mark_as_parsed()
    return module


@pytest.mark.parametrize("eps", [1e-3, 1e-2])
def test_value_rescaling_golden(eps):
    ref = _load_reference_r2d2()
    from absl import flags

    from seed_rl_tpu.ops import value_ops as ours

    flags.FLAGS.value_function_rescaling_epsilon = eps
    x = np.linspace(-50.0, 50.0, 41).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ref.value_function_rescaling(x)),
        np.asarray(ours.value_function_rescaling(x, eps)),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ref.inverse_value_function_rescaling(x)),
        np.asarray(ours.inverse_value_function_rescaling(x, eps)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("n_steps", [1, 2, 5])
def test_n_step_bellman_target_golden(n_steps):
    ref = _load_reference_r2d2()
    from seed_rl_tpu.ops import value_ops as ours

    rng = np.random.default_rng(3)
    T, B = 9, 4
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.uniform(size=(T, B)) < 0.25
    q_target = rng.normal(size=(T, B)).astype(np.float32)
    gamma = 0.997

    ref_out = np.asarray(
        ref.n_step_bellman_target(rewards, done, q_target, gamma, n_steps)
    )
    our_out = np.asarray(
        ours.n_step_bellman_target(rewards, done, q_target, gamma, n_steps)
    )
    np.testing.assert_allclose(ref_out, our_out, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_steps,eta", [(5, 0.9), (2, 0.5)])
def test_loss_and_priorities_golden(n_steps, eta):
    """The full sequence double-DQN loss + priority computation matches the
    reference implementation on random agent/target outputs."""
    ref = _load_reference_r2d2()
    from absl import flags

    from seed_rl_tpu.ops import value_ops as ours

    flags.FLAGS.n_steps = n_steps
    flags.FLAGS.value_function_rescaling_epsilon = 1e-3

    rng = np.random.default_rng(11)
    T, B, A = 8, 3, 6
    q_values = rng.normal(size=(T, B, A)).astype(np.float32)
    target_q = rng.normal(size=(T, B, A)).astype(np.float32)
    online_argmax = q_values.argmax(-1).astype(np.int32)
    replay_action = rng.integers(0, A, size=(T, B)).astype(np.int32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.uniform(size=(T, B)) < 0.2
    gamma = 0.997

    ref_loss, ref_pri = ref.compute_loss_and_priorities_from_agent_outputs(
        AgentOutput(action=online_argmax, q_values=q_values),
        AgentOutput(action=None, q_values=target_q),
        EnvOutput(reward=rewards, done=done),
        AgentOutput(action=replay_action, q_values=None),
        gamma,
        eta=eta,
    )
    our_loss, our_pri = ours.td_loss_and_priorities(
        q_values,
        target_q,
        online_argmax,
        replay_action,
        rewards,
        done,
        gamma=gamma,
        n_steps=n_steps,
        eta=eta,
        rescaling_eps=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ref_loss), np.asarray(our_loss), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_pri), np.asarray(our_pri), rtol=1e-4, atol=1e-4
    )


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
