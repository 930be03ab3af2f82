"""Golden tests: Football codec and DmLab adapter vs the REFERENCE code.

Same trick as test_atari_golden.py: the reference implementations are
loaded straight from /root/reference (with stub `gym`/`deepmind_lab`
modules for their imports — TensorFlow itself is real in this image) and
driven side-by-side with ours over identical inputs/fake backends, so
parity is proven byte-for-byte without the real gfootball/deepmind_lab
dependencies:

- football/observation.py PackedBitsObservation + unpackbits
  (reference :22-63): bit-pack layout and device-side unpack must agree
  exactly or the GFootball net sees scrambled planes.
- dmlab/env.py DmLab (reference :86-149): discrete->raw action mapping,
  action-repeat pass-through, per-episode reseeding stream, level-name
  resolution, config stringification.
- dmlab/env.py LevelCache (reference :57-80): md5 fan-out layout and
  fetch/write interop (a cache written by one implementation must be
  readable by the other — they share GCS directories in the reference
  deployment).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_FOOTBALL = "/root/reference/football/observation.py"
REF_DMLAB = "/root/reference/dmlab/env.py"
REF_GAMES = "/root/reference/dmlab/games.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FOOTBALL), reason="reference checkout not present"
)


def _ensure_gym_stub():
    """Create-or-extend a stub `gym` module covering the reference imports
    (test_atari_golden.py may have installed a smaller stub already)."""
    gym_mod = sys.modules.get("gym")
    if gym_mod is None:
        gym_mod = types.ModuleType("gym")
        sys.modules["gym"] = gym_mod
    if not hasattr(gym_mod, "spaces"):
        gym_mod.spaces = types.ModuleType("gym.spaces")
        sys.modules["gym.spaces"] = gym_mod.spaces

    class Box:
        def __init__(self, low=0, high=255, shape=None, dtype=None):
            self.low, self.high = low, high
            self.shape, self.dtype = shape, dtype

    class Discrete:
        def __init__(self, n):
            self.n = n

    class Env:
        pass

    class ObservationWrapper:
        def __init__(self, env):
            self.env = env
            self.observation_space = getattr(
                env, "observation_space", None
            )

    for name, value in [("Box", Box), ("Discrete", Discrete)]:
        if not hasattr(gym_mod.spaces, name):
            setattr(gym_mod.spaces, name, value)
    if not hasattr(gym_mod, "Env"):
        gym_mod.Env = Env
    if not hasattr(gym_mod, "ObservationWrapper"):
        gym_mod.ObservationWrapper = ObservationWrapper
    return gym_mod


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


# ---------------------------------------------------------------------------
# Football observation codec
# ---------------------------------------------------------------------------


def _load_reference_football():
    _ensure_gym_stub()
    return _load_module(REF_FOOTBALL, "reference_football_observation")


@pytest.mark.parametrize("channels", [16, 4, 51])
def test_packed_bits_golden(channels):
    """Host-side bit packing matches the reference byte-for-byte,
    including the odd-channel zero-pad path."""
    ref = _load_reference_football()
    from seed_rl_tpu.envs import football as ours

    rng = np.random.default_rng(0)
    planes = rng.integers(0, 2, (3, 5, 7, channels)).astype(bool)

    class _SpecEnv:
        class observation_space:
            shape = planes.shape

    ref_packed = ref.PackedBitsObservation(_SpecEnv()).observation(planes)
    our_packed = ours.PackedBitsObservation.observation(
        ours.PackedBitsObservation.__new__(ours.PackedBitsObservation),
        planes,
    )
    assert ref_packed.dtype == our_packed.dtype == np.uint16
    np.testing.assert_array_equal(ref_packed, our_packed)

    # Declared wire shape agrees too.
    assert ref_packed.shape[-1] == (channels + 15) // 16


@pytest.mark.parametrize("channels", [16, 32, 51])
def test_unpackbits_golden_vs_reference_tf(channels):
    """Our device-side JAX unpack reproduces the reference's TF unpack
    bit-for-bit on reference-packed data (and inverts the codec)."""
    import tensorflow as tf

    ref = _load_reference_football()
    from seed_rl_tpu.envs import football as ours

    rng = np.random.default_rng(1)
    planes = rng.integers(0, 2, (2, 3, 4, channels)).astype(bool)

    class _SpecEnv:
        class observation_space:
            shape = planes.shape

    packed = ref.PackedBitsObservation(_SpecEnv()).observation(planes)

    ref_out = np.asarray(ref.unpackbits(tf.constant(packed)))
    our_out = np.asarray(ours.unpackbits(packed))
    np.testing.assert_array_equal(ref_out, our_out)

    # Roundtrip: original planes recovered as {0, 255} after dropping pad.
    np.testing.assert_array_equal(
        our_out[..., :channels], planes.astype(np.float32) * 255.0
    )


# ---------------------------------------------------------------------------
# DmLab adapter
# ---------------------------------------------------------------------------


class _FakeLab:
    """Deterministic deepmind_lab.Lab stand-in recording every call."""

    EPISODE_STEPS = 100

    def __init__(self, level=None, observations=None, config=None,
                 level_cache=None, **kwargs):
        self.level = level
        self.requested_observations = list(observations or [])
        self.config = dict(config or {})
        self.level_cache = level_cache
        self.seeds = []
        self.raw_actions = []
        self.num_steps_args = []
        self._t = 0

    def reset(self, seed=None):
        self.seeds.append(seed)
        self._t = 0

    def step(self, raw_action, num_steps=1):
        self.raw_actions.append(np.array(raw_action))
        self.num_steps_args.append(num_steps)
        self._t += 1
        return float(np.sum(raw_action)) * 0.5 + num_steps + self._t

    def is_running(self):
        return self._t < self.EPISODE_STEPS

    def observations(self):
        h = int(self.config.get("height", 72))
        w = int(self.config.get("width", 96))
        frame = (np.arange(h * w * 3).reshape(h, w, 3) + self._t) % 255
        return {"RGB_INTERLEAVED": frame.astype(np.uint8)}

    def close(self):
        pass


def _load_reference_dmlab(fake_lab_module):
    _ensure_gym_stub()
    # Stub the reference's package-internal + native imports.
    seed_rl = types.ModuleType("seed_rl")
    seed_rl_common = types.ModuleType("seed_rl.common")
    common_flags = types.ModuleType("seed_rl.common.common_flags")
    seed_rl_dmlab = types.ModuleType("seed_rl.dmlab")
    games = _load_module(REF_GAMES, "reference_dmlab_games")
    seed_rl.common = seed_rl_common
    seed_rl_common.common_flags = common_flags
    seed_rl.dmlab = seed_rl_dmlab
    seed_rl_dmlab.games = games
    sys.modules["seed_rl"] = seed_rl
    sys.modules["seed_rl.common"] = seed_rl_common
    sys.modules["seed_rl.common.common_flags"] = common_flags
    sys.modules["seed_rl.dmlab"] = seed_rl_dmlab
    sys.modules["seed_rl.dmlab.games"] = games
    sys.modules["deepmind_lab"] = fake_lab_module

    if "reference_dmlab_env" in sys.modules:
        return sys.modules["reference_dmlab_env"]
    module = _load_module(REF_DMLAB, "reference_dmlab_env")
    from absl import flags

    if not flags.FLAGS.is_parsed():
        flags.FLAGS.mark_as_parsed()
    return module


def _fake_lab_module():
    mod = types.ModuleType("deepmind_lab")
    mod.Lab = _FakeLab
    mod.set_runfiles_path = lambda path: None
    return mod


def test_dmlab_adapter_golden():
    """Same Lab-facing behavior as the reference: level resolution, config
    stringification, raw action mapping, action repeats, and the
    per-episode reseeding stream from the same task seed."""
    fake_mod = _fake_lab_module()
    ref_env_mod = _load_reference_dmlab(fake_mod)

    game, seed, repeats = "explore_goal_locations_small", 7, 4
    ref_env = ref_env_mod.DmLab(
        game, repeats, seed=seed, is_test=False,
        config={"width": 96, "height": 72, "logLevel": "WARN"},
    )

    # Our adapter against the same fake backend.
    sys.modules["deepmind_lab"] = fake_mod
    from seed_rl_tpu.envs.dmlab import DmLab as OurDmLab

    our_env = OurDmLab(game, seed=seed, num_action_repeats=repeats)

    ref_lab, our_lab = ref_env._env, our_env._env
    assert ref_lab is not our_lab  # two independent fake instances

    # Level name resolution + requested observations + config strings.
    assert ref_lab.level == our_lab.level == (
        "contributed/dmlab30/" + game
    )
    assert ref_lab.requested_observations == our_lab.requested_observations
    for key in ("width", "height", "logLevel"):
        assert ref_lab.config[key] == our_lab.config[key]

    # Episode seeds: both draw from RandomState(seed).randint(0, 2**31-1).
    ref_env.reset()
    our_env.reset()
    assert ref_lab.seeds == our_lab.seeds

    # Action mapping + repeats + reward pass-through, across the whole set.
    for action in range(ref_env.action_space.n):
        ref_step = ref_env.step(action)
        our_step = our_env.step(action)
        np.testing.assert_array_equal(
            ref_lab.raw_actions[-1], our_lab.raw_actions[-1]
        )
        assert ref_lab.raw_actions[-1].dtype == np.intc
        assert ref_lab.num_steps_args[-1] == our_lab.num_steps_args[-1]
        assert ref_step[1] == our_step[1]  # identical reward pass-through

    # Termination parity at the episode horizon; both adapters then draw
    # their NEXT episode seed from the same stream (the reference reseeds
    # on its explicit reset, ours auto-resets inside step).
    ref_lab._t = our_lab._t = _FakeLab.EPISODE_STEPS - 1
    ref_obs, _, ref_done, _ = ref_env.step(0)
    _, _, our_done, _, _ = our_env.step(0)
    assert ref_done and our_done
    assert ref_obs is None  # reference contract: None when done
    ref_env.reset()
    assert ref_lab.seeds == our_lab.seeds


def test_level_cache_golden_interop(tmp_path):
    """md5 fan-out layout matches, and caches are interoperable: an entry
    written by the reference LevelCache is fetched by ours and vice versa."""
    fake_mod = _fake_lab_module()
    ref_env_mod = _load_reference_dmlab(fake_mod)
    from seed_rl_tpu.envs.dmlab import LevelCache as OurLevelCache

    cache_dir = str(tmp_path / "cache")
    ref_cache = ref_env_mod.LevelCache(cache_dir)
    our_cache = OurLevelCache(cache_dir)

    key = "some/level:seed=123"
    assert ref_cache.get_path(key) == our_cache.get_path(key)

    src = tmp_path / "level.pk3"
    src.write_bytes(b"compiled-level-bytes")

    # Reference writes -> ours fetches.
    ref_cache.write(key, str(src))
    out = tmp_path / "fetched_by_ours.pk3"
    assert our_cache.fetch(key, str(out))
    assert out.read_bytes() == b"compiled-level-bytes"

    # Ours writes -> reference fetches.
    key2 = "another/level:seed=9"
    src2 = tmp_path / "level2.pk3"
    src2.write_bytes(b"other-bytes")
    our_cache.write(key2, str(src2))
    out2 = tmp_path / "fetched_by_ref.pk3"
    assert ref_cache.fetch(key2, str(out2))
    assert out2.read_bytes() == b"other-bytes"

    # Both miss identically on unknown keys.
    assert not ref_cache.fetch("missing", str(tmp_path / "x.pk3"))
    assert not our_cache.fetch("missing", str(tmp_path / "y.pk3"))


# ---------------------------------------------------------------------------
# V-trace vs the reference TF implementation (bonus: TF is in this image)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "clip_rho,clip_pg_rho,lambda_",
    [(1.0, 1.0, 1.0), (3.7, 2.2, 0.9), (None, None, 1.0)],
)
def test_vtrace_golden_vs_reference_tf(clip_rho, clip_pg_rho, lambda_):
    """Our V-trace matches the reference's actual TF implementation
    (common/vtrace.py:34-148) executed side-by-side — stronger than the
    ported numpy ground truth, since it runs the reference's own code."""
    ref_vtrace = _load_module(
        "/root/reference/common/vtrace.py", "reference_vtrace"
    )
    from seed_rl_tpu.ops import vtrace as ours

    rng = np.random.default_rng(42)
    T, B = 7, 5
    log_pi = rng.normal(size=(T, B)).astype(np.float32)
    log_mu = rng.normal(size=(T, B)).astype(np.float32)
    discounts = (
        rng.uniform(size=(T, B)).astype(np.float32)
        * (rng.uniform(size=(T, B)) > 0.2)
    ).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)

    ref_out = ref_vtrace.from_importance_weights(
        log_pi, log_mu, discounts, rewards, values, bootstrap,
        clip_rho_threshold=clip_rho,
        clip_pg_rho_threshold=clip_pg_rho,
        lambda_=lambda_,
    )
    our_out = ours.from_importance_weights(
        log_pi, log_mu, discounts, rewards, values, bootstrap,
        clip_rho_threshold=clip_rho,
        clip_pg_rho_threshold=clip_pg_rho,
        lambda_=lambda_,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.vs), np.asarray(our_out.vs),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.pg_advantages),
        np.asarray(our_out.pg_advantages),
        rtol=2e-5, atol=2e-5,
    )


import pytest as _pytest_tiering  # noqa: E402

# Critical tier: fast golden/data-plane pinning tests (pytest -m critical
# is the documented pre-commit gate; see pytest.ini).
pytestmark = _pytest_tiering.mark.critical
