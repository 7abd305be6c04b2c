"""Dissect the 2^18 MSM wall-clock by stage on the real TPU.

Stages timed as separate jits (readback-fenced, amortized over ITERS):
  sort-only, gather-only, fold-only (fori_loop of madd columns),
  bucket-pipeline (one window), weighted-total, full msm.
Plus XLA cost_analysis (flops / bytes) for the full MSM executable, to
compare against the measured time (roofline attribution).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.jacobian import JPoint
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.ops import msm as msmmod

print("platform:", jax.devices()[0].platform, flush=True)

import os

curve = BLS12_381_G1
LOG_N = int(os.environ.get("MSM_LOG_N", "18"))
n = 1 << LOG_N
ITERS = 8
rng = np.random.default_rng(3)

ks = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
scal_k = np.asarray(
    limb.pack(curve.scalar, np.array([int(k) for k in ks], dtype=object))
)
pts = msmmod.fixed_base_msm(curve, scal_k, n_bits=30)
pts = jac.normalize(curve, pts)
pts = jax.device_put(pts)
jax.block_until_ready(pts.x)

import random as pyrandom

r_mod = curve.scalar.modulus
pyr = pyrandom.Random(5)
ss = [pyr.randrange(1, r_mod) for _ in range(n)]
scal = jax.device_put(
    jnp.asarray(limb.pack(curve.scalar, np.array(ss, dtype=object)))
)

c = msmmod._default_window_bits(n, 255)
print(f"n=2^{LOG_N}, default c={c}", flush=True)
digits = msmmod._digits(np.asarray(scal), 3, c)
digits_dev = jax.device_put(jnp.asarray(digits))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # fence via readback
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# -- stage: packed sort of one window's digits -------------------------------
@jax.jit
def sort_stage(d):
    idx_bits = max(1, (n - 1).bit_length())
    packed = (d.astype(jnp.uint32) << jnp.uint32(idx_bits)) | jnp.arange(
        n, dtype=jnp.uint32
    )
    ps = jnp.sort(packed)
    return ps


# -- stage: gather points in sorted order ------------------------------------
@jax.jit
def gather_stage(d, px, py):
    F = jac.field_ops(curve)
    order = jnp.argsort(d)
    xy = F.take(jnp.concatenate([px, py], axis=0), order)
    return xy


# -- stage: serial fold over r columns (the madd chain) ----------------------
@jax.jit
def fold_stage(px, py, pz):
    r = 32
    l = n // r

    def rt(v):
        return jnp.moveaxis(v.reshape(v.shape[:-1] + (l, r)), -1, -2)

    cx, cy, cz = rt(px), rt(py), rt(pz)
    acc0 = tuple(jac.identity(curve, (l,)))

    def col(v, j):
        return lax.squeeze(
            lax.dynamic_slice_in_dim(v, j, 1, axis=v.ndim - 2), (v.ndim - 2,)
        )

    def body(j, acc):
        q = JPoint(col(cx, j), col(cy, j), col(cz, j))
        return tuple(jac.madd(curve, JPoint(*acc), q))

    return lax.fori_loop(0, r, body, acc0)


# -- stage: one full window bucket pipeline ----------------------------------
@jax.jit
def bucket_stage(d, p):
    return tuple(msmmod._bucket_totals_fast(curve, p, d, c, normalized=True))


# -- stage: weighted bucket total ---------------------------------------------
@jax.jit
def weighted_stage(b):
    return tuple(msmmod._weighted_bucket_total(curve, JPoint(*b), c))


timed("sort(1 window)", sort_stage, digits_dev)
timed("gather(1 window)", gather_stage, digits_dev, pts.x, pts.y)
timed("fold(1 window, r=32)", fold_stage, pts.x, pts.y, pts.z)
bt = bucket_stage(digits_dev, pts)
timed("bucket pipeline(1 window)", bucket_stage, digits_dev, pts)
timed("weighted total(1 window)", weighted_stage, bt)
t_full = timed("full msm", lambda s: tuple(msmmod.msm(curve, s, pts)), scal)

n_windows = -(-255 // c)
print(f"windows={n_windows}; per-window budget {t_full*1e3/n_windows:.2f} ms", flush=True)

# -- XLA cost analysis of the full executable ---------------------------------
lowered = msmmod._msm_jit.lower(curve, np.asarray(scal), pts, None, None)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
if ca:
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"cost_analysis: flops={flops:.3e} bytes={bytes_:.3e}", flush=True)
    print(
        f"  -> arithmetic time @ 2e12 int-op/s ~ {flops/2e12*1e3:.1f} ms; "
        f"HBM time @ 800GB/s ~ {bytes_/8e11*1e3:.1f} ms",
        flush=True,
    )
