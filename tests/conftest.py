"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (BASELINE config #4 logic on a fake mesh)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
