"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Multi-chip sharding logic is validated on virtual CPU devices; real-TPU
benchmarking happens in bench.py (driver-run). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)  # framework must not rely on x64
jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
