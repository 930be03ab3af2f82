"""Test fixture: run everything on 8 virtual CPU devices.

Mirrors the reference's simulated multi-device strategy
(/root/reference/agents/policy_gradient/modules/test_utils.py:76-108, which
splits one physical device into two): here we ask XLA for 8 host devices so
mesh/sharding/collective paths are exercised without TPU hardware. Must run
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
