"""Test configuration: force a CPU backend with an 8-device virtual mesh.

This image's `sitecustomize` registers the axon TPU backend in EVERY Python
process and pins `jax_platforms=axon` via jax.config — so plain
JAX_PLATFORMS=cpu in the environment is ignored. The fix is an in-process
`jax.config.update` before any backend initializes (backends are lazy).
Never re-exec from a conftest: pytest's fd-capture is already active, so an
exec'd child inherits the capture tempfile as stdout and the whole session's
output vanishes.

Escape hatch: OPENZL_TPU_TEST_BACKEND=axon keeps the TPU backend (its
remote-compile service is ~10-30x faster than local 4-core XLA-CPU — the
right home for the compile-heavy `-m heavy` suite, run one process at a
time).

Multi-chip sharding logic is validated on the virtual CPU devices; real-TPU
verification happens via tools/verify_drive*.py and bench.py (run serially,
one JAX process at a time).
"""

import os

import jax

if os.environ.get("OPENZL_TPU_TEST_BACKEND") != "axon":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)  # framework must not rely on x64
# Persistent-cache serialization of CPU executables segfaults flakily in
# this jax build after many compiles in one process (observed twice at the
# same suite position, in both the read and write paths), so the CPU suite
# runs cache-less. The axon suite keeps its own cache dir (no crashes seen
# there, and remote compiles are the expensive ones).
if os.environ.get("OPENZL_TPU_TEST_BACKEND") == "axon":
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
