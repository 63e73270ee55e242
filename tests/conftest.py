"""Test configuration: CPU backend with 8 virtual devices and f64.

Mirrors the reference's validation regime (f64 everywhere, common.h) and the
TPU analogue of "fake backends" for multi-chip tests (SURVEY.md section 4):
`xla_force_host_platform_device_count=8` simulates an 8-chip mesh on CPU.
Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu"; override after import, before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the large unrolled solver graphs; repeat runs (local
# iteration, CI re-runs) hit the cache and skip them.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DEDFLOW_TEST_CACHE", "/tmp/dedflow_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
