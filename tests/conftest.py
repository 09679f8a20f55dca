"""Test configuration: force an 8-device virtual CPU mesh so tests compile
fast and sharding tests run without TPU hardware (BASELINE config #4 logic
on a fake mesh).

The container's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"``; overriding via env var is not enough, so we
update the config after import.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# RLT_TEST_TPU=1 keeps the real accelerator visible (used for the heavy
# megakernel tests whose component-form graphs compile in ~30s on TPU but
# pathologically slowly on XLA:CPU).
if not os.environ.get("RLT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles on
# small CPU hosts; cache them across runs (keyed by HLO, safe on change).
# The TPU tier shares bench.py's repo-local cache so chip-side compiles
# through the tunnel survive across sessions (VERDICT r3 weak #3).
if os.environ.get("RLT_TEST_TPU"):
    _cache = os.environ.get(
        "RLT_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
else:
    _cache = "/tmp/jax_test_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
