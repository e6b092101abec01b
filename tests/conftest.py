"""Test configuration: run JAX on CPU with x64 and 8 virtual devices.

This environment's sitecustomize registers a TPU ("axon") PJRT plugin and
imports jax at interpreter startup, so JAX_PLATFORMS set from Python is
too late — the config must be updated through jax.config.  The driver
validates multi-chip sharding the same way
(xla_force_host_platform_device_count); real-TPU behavior is covered by
bench.py on hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the GLS graphs are compile-heavy; warm runs
# of the suite drop from ~12 min to ~3 min
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/ninpol_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
