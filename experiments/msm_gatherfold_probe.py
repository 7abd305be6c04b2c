"""Microbenchmark driving the fused gather-fold MSM kernel design (VERDICT
r4 item 3: ~95% of the 3.09 s 2^20 MSM is row gather + serial madd fold).

Questions, each answered with a fenced timing at n = 2^20:
  1. Gather payload width: the current row gather fetches 128-u32
     lane-padded rows (512 B) for a 128 B x||y payload. Do narrower dtypes
     (u16 / u8 views of the 16-bit limbs) cut wall-clock proportionally?
  2. Reconstruction cost: widening u8/u16 rows back to u32 limb planes.
  3. Fold floor: the serial r=32-column madd fold at width n/32 alone,
     vs one full `_bucket_totals_fast` window, vs the sort.

Run: MSM_LOG_N=20 python experiments/msm_gatherfold_probe.py
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
K = 48  # x||y 16-bit limbs in u32 lanes (BLS12-381 G1 Fq has 24 limbs), skip_z
ITERS = 8

rng = np.random.default_rng(0)
rows_u32 = rng.integers(0, 2**16, size=(N, K), dtype=np.uint32)
rows_pad128 = np.concatenate([rows_u32, np.zeros((N, 128 - K), np.uint32)], 1)
rows_u16 = rows_u32.astype(np.uint16)
rows_u8 = rows_u16.view(np.uint8)  # (N, 64)
rows_u8_pad = np.concatenate([rows_u8, np.zeros((N, 128 - 2 * K), np.uint8)], 1)

d_pad128 = jax.device_put(jnp.asarray(rows_pad128))
d_u32 = jax.device_put(jnp.asarray(rows_u32))
d_u16 = jax.device_put(jnp.asarray(rows_u16))
d_u8 = jax.device_put(jnp.asarray(rows_u8))
d_u8p = jax.device_put(jnp.asarray(rows_u8_pad))
idx = jax.device_put(jnp.asarray(rng.permutation(N).astype(np.int32)))
jax.block_until_ready(d_u8p)


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


# -- 1. gather payload width -------------------------------------------------

timed("gather rows u32 pad128 (current)", jax.jit(lambda s, i: s[i, :]), d_pad128, idx)
timed("gather rows u32 narrow (N,32)", jax.jit(lambda s, i: s[i, :]), d_u32, idx)
timed("gather rows u16 (N,32)", jax.jit(lambda s, i: s[i, :]), d_u16, idx)
timed("gather rows u8 (N,64)", jax.jit(lambda s, i: s[i, :]), d_u8, idx)
timed("gather rows u8 pad128", jax.jit(lambda s, i: s[i, :]), d_u8p, idx)

# -- 2. reconstruction -------------------------------------------------------


@jax.jit
def gather_u16_widen(s, i):
    return jnp.moveaxis(s[i, :].astype(jnp.uint32), -1, 0)


@jax.jit
def gather_u8_widen(s, i):
    g = s[i, :]  # (N, 64) u8
    lo = g[:, 0::2].astype(jnp.uint32)
    hi = g[:, 1::2].astype(jnp.uint32)
    return jnp.moveaxis(lo | (hi << 8), -1, 0)


@jax.jit
def gather_u32_transpose(s, i):
    return jnp.moveaxis(s[i, :], -1, 0)


timed("gather u32 pad128 + transpose (current full)",
      jax.jit(lambda s, i: jnp.moveaxis(s[i, :], -1, 0)), d_pad128, idx)
timed("gather u32 narrow + transpose", gather_u32_transpose, d_u32, idx)
timed("gather u16 + widen + transpose", gather_u16_widen, d_u16, idx)
timed("gather u8 + widen + transpose", gather_u8_widen, d_u8, idx)

# -- 3. fold floor: serial madd columns --------------------------------------

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR
from jax import lax

curve = BLS12_381_G1
F = jac.field_ops(curve)
R = 32
L = N // R

xs = jnp.asarray(rng.integers(0, 2**16, size=(24, R, L), dtype=np.uint32))
ys = jnp.asarray(rng.integers(0, 2**16, size=(24, R, L), dtype=np.uint32))
one = F.one((R, L))


@jax.jit
def fold_only(px, py, pz):
    acc0 = tuple(jac.identity(curve, (L,)))

    def col(v, j):
        return lax.squeeze(
            lax.dynamic_slice_in_dim(v, j, 1, axis=v.ndim - 2), (v.ndim - 2,)
        )

    def body(j, acc):
        q = jac.JPoint(col(px, j), col(py, j), col(pz, j))
        return tuple(jac.madd(curve, jac.JPoint(*acc), q))

    return lax.fori_loop(0, R, body, acc0)


timed("serial madd fold r=32 (no buffers)", fold_only, xs, ys, one)


@jax.jit
def fold_with_buffers(px, py, pz):
    acc0 = tuple(jac.identity(curve, (L,)))
    buf0 = tuple(jnp.zeros((24, R, L), jnp.uint32) for _ in range(3))

    def col(v, j):
        return lax.squeeze(
            lax.dynamic_slice_in_dim(v, j, 1, axis=v.ndim - 2), (v.ndim - 2,)
        )

    def body(j, carry):
        acc, bufs = carry
        q = jac.JPoint(col(px, j), col(py, j), col(pz, j))
        out = tuple(jac.madd(curve, jac.JPoint(*acc), q))
        bufs = tuple(
            lax.dynamic_update_slice_in_dim(b, a[..., None, :], j, axis=b.ndim - 2)
            for b, a in zip(bufs, out)
        )
        return (out, bufs)

    return lax.fori_loop(0, R, body, (acc0, buf0))


timed("serial madd fold r=32 + prefix buffers (current)", fold_with_buffers, xs, ys, one)

# -- sort floor --------------------------------------------------------------

packed = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, size=(N,), dtype=np.uint32))
)
timed("packed-key sort (per window)", jax.jit(jnp.sort), packed)
