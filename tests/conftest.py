"""Test configuration: force a CPU backend with an 8-device virtual mesh.

This image's `sitecustomize` registers the axon TPU backend in EVERY Python
process (and pins JAX_PLATFORMS=axon) before conftest runs, so an in-process
override is impossible — tests would otherwise serialize through the single
TPU tunnel and contend with any other JAX process. Fix: re-exec pytest once
with the axon trigger env (`PALLAS_AXON_POOL_IPS`) scrubbed; the re-exec'd
process gets a clean 8-virtual-device CPU JAX.

Multi-chip sharding logic is validated on the virtual CPU devices; real-TPU
verification happens via tools/verify_drive*.py and bench.py (run serially,
one JAX process at a time).
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)  # framework must not rely on x64
jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
