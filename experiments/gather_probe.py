"""Microbenchmark: XLA gather layouts for the MSM sorted-point gather.

The MSM bucket pipeline gathers 2^20 points (48 u32 limbs each for x||y)
into digit-sorted order. msm_profile measured the current limb-planar
gather — take((48, N), idx, axis=-1) — at ~1.4 s/window at n=2^20, 45x
the rest of the window pipeline combined. Hypothesis: minor-axis gathers
scatter 4-byte elements across lanes; gathering contiguous point ROWS
(axis-0 of an (N, row) array) maps to efficient per-row DMA, and the
limb-planar layout can be restored with one dense transpose.

Variants (all fenced by readback):
  A. take((48, N), idx, axis=-1)              -- current
  B. take((N, 48), idx, axis=0)               -- row gather
  C. take((N, 128), idx, axis=0)              -- row gather, lane-padded
  D. B + transpose back to (48, M)
  E. one-u32-packed sort key + payload-free: sort only (baseline floor)
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

print("platform:", jax.devices()[0].platform, flush=True)

LOG_N = int(os.environ.get("MSM_LOG_N", "20"))
N = 1 << LOG_N
ITERS = 8

rng = np.random.default_rng(0)
src_planar = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, size=(48, N), dtype=np.uint32))
)
src_rows = jax.device_put(jnp.asarray(np.asarray(src_planar).T.copy()))
src_rows128 = jax.device_put(
    jnp.asarray(
        np.concatenate(
            [np.asarray(src_rows), np.zeros((N, 80), np.uint32)], axis=1
        )
    )
)
idx = jax.device_put(jnp.asarray(rng.permutation(N).astype(np.int32)))
jax.block_until_ready(src_rows128)


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


timed("A planar take axis=-1", jax.jit(lambda s, i: s[:, i]), src_planar, idx)
timed("B row take axis=0", jax.jit(lambda s, i: s[i, :]), src_rows, idx)
timed("C row128 take axis=0", jax.jit(lambda s, i: s[i, :]), src_rows128, idx)
timed(
    "D row take + transpose",
    jax.jit(lambda s, i: s[i, :].T),
    src_rows,
    idx,
)
timed(
    "E transpose only (N,48)->(48,N)",
    jax.jit(lambda s: s.T),
    src_rows,
)
