"""Golden test: running statistics + PopArt vs the reference's TF code.

Loads the reference's running_statistics.py and popart.py (stub gin;
logging_module and TF are real) and drives identical update/normalize
sequences through the reference's tf.Variable-based modules (eager,
single replica — the variable aggregation modes reduce to plain
assignment) and our functional state-passing versions. PopArt's
compensation invariance (s*(x*a + b) + m preserved across stats updates)
is the numerically subtle piece the PPO loss depends on.
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


def _load_reference():
    if "reference_pg_popart" in sys.modules:
        return (
            sys.modules["reference_pg_running_statistics"],
            sys.modules["reference_pg_popart"],
        )
    _stub_gin()
    for name in [
        "seed_rl", "seed_rl.agents", "seed_rl.agents.policy_gradient",
        "seed_rl.agents.policy_gradient.modules",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    running_statistics = _load(
        os.path.join(MODULES, "running_statistics.py"),
        "reference_pg_running_statistics",
    )
    logging_module = _load(
        os.path.join(MODULES, "logging_module.py"),
        "seed_rl.agents.policy_gradient.modules.logging_module",
    )
    mod_pkg = sys.modules["seed_rl.agents.policy_gradient.modules"]
    mod_pkg.running_statistics = running_statistics
    mod_pkg.logging_module = logging_module
    sys.modules[
        "seed_rl.agents.policy_gradient.modules.running_statistics"
    ] = running_statistics
    popart = _load(
        os.path.join(MODULES, "popart.py"), "reference_pg_popart"
    )
    return running_statistics, popart


def _batches(seed, n=5, shape=(7, 3)):
    rng = np.random.default_rng(seed)
    return [
        (rng.normal(loc=2.0, scale=3.0, size=shape) * (k + 1)).astype(
            np.float32
        )
        for k in range(n)
    ]


def test_ema_mean_std_golden():
    ref_rs, _ = _load_reference()
    from seed_rl_tpu.ops import running_statistics as ours

    ref = ref_rs.EMAMeanStd(beta=0.05, std_min_value=1e-5)
    ref.init(3)
    our = ours.EMAMeanStd(beta=0.05, std_min_value=1e-5)
    state = our.init_state(3)
    import tensorflow as tf

    for data in _batches(0):
        ref.update(tf.convert_to_tensor(data))
        state = our.update(state, data)
        ref_mean, ref_std = ref.get_mean_std()
        our_mean, our_std = our.mean_std(state)
        np.testing.assert_allclose(
            np.asarray(ref_mean), np.asarray(our_mean), rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref_std), np.asarray(our_std), rtol=1e-5, atol=1e-6
        )


def test_average_mean_std_golden():
    ref_rs, _ = _load_reference()
    from seed_rl_tpu.ops import running_statistics as ours

    ref = ref_rs.AverageMeanStd()
    ref.init(3)
    our = ours.AverageMeanStd()
    state = our.init_state(3)
    import tensorflow as tf

    for data in _batches(1):
        ref.update(tf.convert_to_tensor(data))
        state = our.update(state, data)
        ref_mean, ref_std = ref.get_mean_std()
        our_mean, our_std = our.mean_std(state)
        np.testing.assert_allclose(
            np.asarray(ref_mean), np.asarray(our_mean), rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref_std), np.asarray(our_std), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("compensate", [True, False])
def test_popart_golden(compensate):
    """normalize_target / normalize_advantage / correct+unnormalize
    prediction agree with the reference through a sequence of statistics
    updates, including the compensation-variable updates."""
    ref_rs, ref_pa = _load_reference()
    from seed_rl_tpu.ops import popart as ours_pa
    from seed_rl_tpu.ops import running_statistics as ours_rs

    ref = ref_pa.PopArt(ref_rs.EMAMeanStd(beta=0.1), compensate=compensate)
    ref.init()
    our = ours_pa.PopArt(ours_rs.EMAMeanStd(beta=0.1),
                         compensate=compensate)
    state = our.init_state()
    params = our.init_params()

    rng = np.random.default_rng(7)
    for k in range(4):
        targets = (
            rng.normal(loc=5.0 * k, scale=2.0 + k, size=(6, 4))
        ).astype(np.float32)
        preds = rng.normal(size=(6, 4)).astype(np.float32)
        x = rng.normal(size=(6, 4)).astype(np.float32)

        np.testing.assert_allclose(
            np.asarray(ref.normalize_target(targets)),
            np.asarray(our.normalize_target(state, targets)),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ref.normalize_advantage(x)),
            np.asarray(our.normalize_advantage(state, x)),
            rtol=1e-4, atol=1e-5,
        )
        ref_pred = ref.unnormalize_prediction(ref.correct_prediction(preds))
        our_pred = our.unnormalize_prediction(
            state, our.correct_prediction(params, preds)
        )
        np.testing.assert_allclose(
            np.asarray(ref_pred), np.asarray(our_pred), rtol=1e-4,
            atol=1e-5,
        )

        import tensorflow as tf

        ref.update_normalization_statistics(tf.convert_to_tensor(targets))
        state, params, _ = our.update_statistics(state, params, targets)

    # After several updates the compensation must have preserved the
    # implicit prediction function (both sides identically).
    preds = rng.normal(size=(6, 4)).astype(np.float32)
    ref_pred = ref.unnormalize_prediction(ref.correct_prediction(preds))
    our_pred = our.unnormalize_prediction(
        state, our.correct_prediction(params, preds)
    )
    np.testing.assert_allclose(
        np.asarray(ref_pred), np.asarray(our_pred), rtol=1e-4, atol=1e-4
    )


def test_two_level_average_mean_std_golden():
    """The precision-hierarchy tracker matches the reference across buffer
    flush boundaries (buffer_size=3 forces flushes mid-sequence)."""
    import tensorflow as tf

    ref_rs, _ = _load_reference()
    from seed_rl_tpu.ops import running_statistics as ours

    ref = ref_rs.TwoLevelAverageMeanStd(buffer_size=3)
    ref.init(2)
    our = ours.TwoLevelAverageMeanStd(buffer_size=3)
    state = our.init_state(2)
    for data in _batches(2, n=8, shape=(5, 2)):
        ref.update(tf.convert_to_tensor(data))
        state = our.update(state, data)
        ref_mean, ref_std = ref.get_mean_std()
        our_mean, our_std = our.mean_std(state)
        np.testing.assert_allclose(
            np.asarray(ref_mean), np.asarray(our_mean), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ref_std), np.asarray(our_std), rtol=1e-4, atol=1e-5
        )


def test_fixed_mean_std_golden():
    import tensorflow as tf

    ref_rs, _ = _load_reference()
    from seed_rl_tpu.ops import running_statistics as ours

    ref = ref_rs.FixedMeanStd(mean=2.5, std=0.5)
    ref.init(3)
    our = ours.FixedMeanStd(mean=2.5, std=0.5)
    state = our.init_state(3)
    ref.update(tf.convert_to_tensor(_batches(3, n=1)[0]))
    state = our.update(state, _batches(3, n=1)[0])
    ref_mean, ref_std = ref.get_mean_std()
    our_mean, our_std = our.mean_std(state)
    np.testing.assert_allclose(np.asarray(ref_mean), np.asarray(our_mean))
    np.testing.assert_allclose(np.asarray(ref_std), np.asarray(our_std))


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
