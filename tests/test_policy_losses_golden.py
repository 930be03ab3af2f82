"""Golden test: PPO-family policy losses vs the reference's actual TF code.

Loads the reference's policy_losses.py (plus its constraints and
logging_module deps) from /root/reference with a stub `gin`, instantiates
the same factories with identical hyperparameters, and compares the loss
VALUES on random inputs for every family: PG, V-trace-IS, PPO (epsilon
mask formulation), AWR (exp transform + fixed temperature + w_max clip)
and V-MPO (top-half softmax + Lagrange temperature + KL adjustment).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

MODULES = "/root/reference/agents/policy_gradient/modules"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MODULES), reason="reference checkout not present"
)


def _stub_gin():
    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")

        def configurable(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        gin.configurable = configurable
        sys.modules["gin"] = gin


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def _load_reference_policy_losses():
    if "reference_pg_policy_losses" in sys.modules:
        return sys.modules["reference_pg_policy_losses"]
    _stub_gin()
    pkg_names = [
        "seed_rl", "seed_rl.agents", "seed_rl.agents.policy_gradient",
        "seed_rl.agents.policy_gradient.modules",
    ]
    for name in pkg_names:
        sys.modules.setdefault(name, types.ModuleType(name))
    constraints = _load(
        os.path.join(MODULES, "constraints.py"),
        "seed_rl.agents.policy_gradient.modules.constraints",
    )
    logging_module = _load(
        os.path.join(MODULES, "logging_module.py"),
        "seed_rl.agents.policy_gradient.modules.logging_module",
    )
    mod_pkg = sys.modules["seed_rl.agents.policy_gradient.modules"]
    mod_pkg.constraints = constraints
    mod_pkg.logging_module = logging_module
    return _load(
        os.path.join(MODULES, "policy_losses.py"),
        "reference_pg_policy_losses",
    )


def _inputs(seed, T=6, B=5):
    rng = np.random.default_rng(seed)
    advantages = rng.normal(size=(T, B)).astype(np.float32)
    log_pi = (-np.abs(rng.normal(size=(T, B)))).astype(np.float32)
    log_mu = (-np.abs(rng.normal(size=(T, B)))).astype(np.float32)
    return advantages, log_pi, log_mu


def _compare(ref_loss_obj, our_loss_obj, seed, rtol=1e-5, atol=1e-5):
    advantages, log_pi, log_mu = _inputs(seed)
    ref = float(
        ref_loss_obj(advantages, log_pi, log_mu, None, None, None)
    )
    params = our_loss_obj.init_params()
    ours, _ = our_loss_obj(params, advantages, log_pi, log_mu)
    np.testing.assert_allclose(ref, float(ours), rtol=rtol, atol=atol)


def test_pg_golden():
    ref = _load_reference_policy_losses()
    from seed_rl_tpu.agents.ppo import policy_losses as ours

    _compare(ref.pg(), ours.pg(), 0)


def test_vtrace_is_golden():
    ref = _load_reference_policy_losses()
    from seed_rl_tpu.agents.ppo import policy_losses as ours

    _compare(ref.vtrace(max_importance_weight=2.0),
             ours.vtrace_is(max_importance_weight=2.0), 1)


@pytest.mark.parametrize("epsilon,normalize", [(0.2, False), (0.1, True)])
def test_ppo_golden(epsilon, normalize):
    ref = _load_reference_policy_losses()
    from seed_rl_tpu.agents.ppo import policy_losses as ours

    _compare(
        ref.ppo(epsilon=epsilon, normalize_advantages=normalize),
        ours.ppo(epsilon=epsilon, normalize_advantages=normalize),
        2,
    )


def test_awr_golden():
    ref = _load_reference_policy_losses()
    from seed_rl_tpu.agents.ppo import policy_losses as ours

    _compare(ref.awr(beta=1.0, w_max=20.0), ours.awr(beta=1.0, w_max=20.0),
             3)


def test_vmpo_golden():
    """V-MPO: top-half preprocessor + softmax transform + Lagrange
    temperature adjustment, at the shared initial temperature."""
    ref_mod = _load_reference_policy_losses()
    constraints_ref = sys.modules[
        "seed_rl.agents.policy_gradient.modules.constraints"
    ]
    from seed_rl_tpu.agents.ppo import policy_losses as ours

    ref_loss = ref_mod.GeneralizedAdvantagePolicyLoss(
        advantage_transformation=ref_mod.softmax_all_dims,
        advantage_preprocessor=ref_mod.AdvantagePreprocessor(
            only_top_half=True
        ),
        temperature=constraints_ref.LagrangeInequalityCoefficient(
            threshold=0.1, adjustment_speed=10, init_variables=True
        ),
    )
    _compare(ref_loss, ours.vmpo(e_n=0.1), 4, rtol=1e-4, atol=1e-4)


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
