"""Persistent XLA compilation cache for fast restarts.

The reference runtime pays its graph-build cost once per process and
amortizes it over hours of training; under JAX the equivalent cost is XLA
compilation of the fused rollout+train program, which for the Atari-scale
nets runs to minutes. Enabling JAX's persistent compilation cache makes
every restart after the first (re-runs, preemption recovery, eval jobs,
benchmarks) start in seconds instead: compiled executables are keyed by
(HLO, compile options, backend version) and re-loaded from disk.

Call :func:`enable_persistent_cache` before the first compilation. Safe to
call multiple times; honors ``SEED_RL_TPU_CACHE_DIR`` (set to the empty
string to disable) and never fails hard — a read-only filesystem or an
unsupported backend silently degrades to cold compiles.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "seed_rl_tpu_xla"
)

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a disk directory.

    Returns the directory in use, or None if disabled/unavailable.
    """
    global _enabled
    if cache_dir is None:
        cache_dir = os.environ.get("SEED_RL_TPU_CACHE_DIR", _DEFAULT_DIR)
    if not cache_dir:  # explicit opt-out
        return None
    if _enabled:
        return cache_dir
    try:
        import jax

        # TPU/accelerator only. XLA:CPU caches AOT executables whose
        # machine-feature stamp embeds compile-time tuning pseudo-features
        # (+prefer-no-gather/scatter); reloading them in another process
        # aborts with a feature-mismatch check. CPU compiles are seconds —
        # the cache exists for the minutes-long TPU builds. The gate is on
        # the PRIMARY platform only: on a TPU host jax_platforms resolves to
        # e.g. "tpu,cpu" (cpu is the ever-present fallback), which must not
        # disable the cache. When no platform is configured at all we have
        # to ask jax.default_backend() — callers invoke this right before
        # their first compilation, so initializing the backend here is free.
        platforms = os.environ.get("JAX_PLATFORMS", "")
        try:
            platforms = jax.config.jax_platforms or platforms
        except Exception:
            pass
        primary = str(platforms).split(",")[0].strip().lower()
        if not primary:
            # No platform configured: only consult the backend if some
            # other code already initialized it. Never initialize here —
            # CPU-only helper processes (actors) colocated with a learner
            # must not grab the accelerator just to decide cache gating.
            try:
                import jax._src.xla_bridge as xb

                if not xb.backends_are_initialized():
                    return None
            except Exception:
                return None
            primary = jax.default_backend()
        if primary == "cpu":
            return None

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program that takes non-trivial time to build; the
        # default 1 GiB/entry floor would skip everything we care about.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return cache_dir
    except Exception:
        return None
