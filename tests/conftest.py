"""Test configuration: force the CPU backend with 8 virtual devices.

Tests exercise exact integer DP semantics, which are backend-independent
(the Pallas kernel is additionally validated in interpreter mode and by
TPU-side checks in bench.py).  An 8-device simulated mesh validates the
multi-device sharding path without TPU hardware, per the reference test
strategy analog (SURVEY.md section 4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the sandbox sitecustomize pins JAX_PLATFORMS=axon; override explicitly
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the oracle cross-check tests compile
# many interpret-mode kernel variants (~3 s each); caching them makes
# repeat suite runs dominated by actual test work instead
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PYOPAL_TPU_TEST_JAX_CACHE", "/tmp/pyopal_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
