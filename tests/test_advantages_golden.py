"""Golden test: PPO advantage estimators vs the reference's actual TF code.

Loads /root/reference/agents/policy_gradient/modules/advantages.py with a
stub `gin` module (TensorFlow itself is real in this image) and compares
our functional estimators against the reference's own implementations on
random inputs covering termination AND abandonment (the done_abandoned
semantics — advantages.py:69-87 — are the subtlest part of the PPO loss
and are load-bearing for curve parity).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ADVANTAGES = (
    "/root/reference/agents/policy_gradient/modules/advantages.py"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ADVANTAGES),
    reason="reference checkout not present",
)


def _load_reference_advantages():
    if "reference_pg_advantages" in sys.modules:
        return sys.modules["reference_pg_advantages"]
    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")

        def configurable(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        gin.configurable = configurable
        sys.modules["gin"] = gin
    spec = importlib.util.spec_from_file_location(
        "reference_pg_advantages", REF_ADVANTAGES
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules["reference_pg_advantages"] = module
    spec.loader.exec_module(module)
    return module


def _random_inputs(seed, T=10, B=4):
    rng = np.random.default_rng(seed)
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    done_terminated = rng.uniform(size=(T, B)) < 0.15
    # Abandonment and termination are mutually exclusive per step.
    done_abandoned = (rng.uniform(size=(T, B)) < 0.15) & ~done_terminated
    log_pi = rng.normal(size=(T, B)).astype(np.float32)
    log_mu = rng.normal(size=(T, B)).astype(np.float32)
    return values, rewards, done_terminated, done_abandoned, log_pi, log_mu


@pytest.mark.parametrize(
    "lambda_,max_iw", [(1.0, 1.0), (0.95, 1.0), (0.9, 2.5)]
)
def test_vtrace_advantages_golden(lambda_, max_iw):
    ref = _load_reference_advantages()
    from seed_rl_tpu.ops import advantages as ours

    (values, rewards, done_t, done_a, log_pi, log_mu) = _random_inputs(0)
    ref_targets, ref_adv = ref.vtrace(
        values, rewards, done_t, done_a, 0.99, log_pi, log_mu,
        lambda_=lambda_, max_importance_weight=max_iw,
    )
    our_targets, our_adv = ours.vtrace(
        values, rewards, done_t, done_a, 0.99, log_pi, log_mu,
        lambda_=lambda_, max_importance_weight=max_iw,
    )
    np.testing.assert_allclose(
        np.asarray(ref_targets), np.asarray(our_targets),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref_adv), np.asarray(our_adv), rtol=1e-5, atol=1e-5
    )


def test_gae_golden():
    ref = _load_reference_advantages()
    from seed_rl_tpu.ops import advantages as ours

    (values, rewards, done_t, done_a, _, _) = _random_inputs(1)
    ref_targets, ref_adv = ref.gae(
        values, rewards, done_t, done_a, 0.99, lambda_=0.95
    )
    our_targets, our_adv = ours.gae(
        values, rewards, done_t, done_a, 0.99, lambda_=0.95
    )
    np.testing.assert_allclose(
        np.asarray(ref_targets), np.asarray(our_targets),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref_adv), np.asarray(our_adv), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("n", [1, 3, 20])
def test_nstep_golden(n):
    """n covering the eff_n = min(n, unroll_length) truncation too."""
    ref = _load_reference_advantages()
    from seed_rl_tpu.ops import advantages as ours

    (values, rewards, done_t, done_a, log_pi, log_mu) = _random_inputs(2)
    ref_est = ref.NStep(n)
    ref_targets, ref_adv = ref_est(
        values, rewards, done_t, done_a, 0.99, log_pi, log_mu
    )
    our_targets, our_adv = ours.n_step(
        values, rewards, done_t, done_a, 0.99, n, log_pi, log_mu
    )
    np.testing.assert_allclose(
        np.asarray(ref_targets), np.asarray(our_targets),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref_adv), np.asarray(our_adv), rtol=1e-5, atol=1e-5
    )


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
