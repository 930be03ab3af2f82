"""Test fixture: run everything on 8 virtual CPU devices.

Mirrors the reference's simulated multi-device strategy
(/root/reference/agents/policy_gradient/modules/test_utils.py:76-108, which
splits one physical device into two): here we ask XLA for 8 host devices so
mesh/sharding/collective paths are exercised without TPU hardware. Must run
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (an experimental remote-TPU PJRT plugin whose
# remote-compile relay makes compiles ~100-400x slower), so the env var above
# is read too late. Force the platform through jax.config and drop the axon
# factory so no code path can initialize it.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _xb._topology_factories.pop("axon", None)
except Exception:  # pragma: no cover - plugin absent outside the container
    pass
