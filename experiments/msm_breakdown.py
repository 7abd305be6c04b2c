"""Where does MSM wall-clock go? Phase-isolated timings at 2^18/2^20.

Phases per window (ops/msm.py):
  A. digit extraction              (cheap)
  B. argsort by digit              (XLA sort)
  C. gather points into sort order (random HBM gather, 300MB at 2^20)
  D. chunked serial fold (madds)   (EC math — Pallas kernel)
  E. bucket scans + Horner         (bucket-width work)

Run: python experiments/msm_breakdown.py [--log-n 20]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax import lax

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.jacobian import JPoint
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.ops import msm as msmmod
from openzl_tpu.ops.msm import _bucket_totals_fast, _digits, _weighted_bucket_total


def fence(out):
    """Readback fence: block_until_ready does not reliably fence through the
    axon tunnel (see bench.py); a tiny np.asarray readback does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return out


def t(fn, *args, iters=3):
    out = fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--c", type=int, default=0)
    args = ap.parse_args()
    curve = BLS12_381_G1
    n = 1 << args.log_n
    c = args.c or msmmod._default_window_bits(n)
    n_windows = -(-255 // c)
    print(f"n=2^{args.log_n} c={c} windows={n_windows}", flush=True)

    rng = np.random.default_rng(0)
    d = rng.integers(1, 1 << 63, size=n, dtype=np.uint64)
    dk = limb.pack(curve.scalar, d.astype(object))
    pts = msmmod.fixed_base_msm(curve, jnp.asarray(dk), n_bits=64)
    pts = jax.jit(jac.normalize, static_argnums=0)(curve, pts)
    jax.block_until_ready(pts.x)
    s = rng.integers(0, 1 << 31, size=(curve.scalar.n_limbs, n), dtype=np.uint32) & 0xFFFF
    sk = jnp.asarray(s)

    # full MSM
    dt, _ = t(lambda sc: msmmod._msm_jit(curve, sc, pts, None, None), sk, iters=1)
    print(f"full msm: {dt*1e3:.1f} ms", flush=True)

    # A: digits for all windows
    f_dig = jax.jit(lambda sc: jnp.stack([_digits(sc, w, c) for w in range(n_windows)]))
    dt, digits_all = t(f_dig, sk)
    print(f"digits (all {n_windows} windows): {dt*1e3:.1f} ms", flush=True)
    d0 = digits_all[0]

    # B: argsort, one window
    f_sort = jax.jit(jnp.argsort)
    dt, order = t(f_sort, d0)
    print(f"argsort x{n_windows}: {dt*n_windows*1e3:.1f} ms ({dt*1e3:.2f} ea)", flush=True)

    # C: gather, one window — layout variants (operands as jit ARGS: captured
    # 300MB constants exceed the axon remote-compile request limit)
    f_gather = jax.jit(lambda v, o: v[..., o])
    xy_cat = jnp.concatenate([pts.x, pts.y], axis=0)
    dt, _ = t(f_gather, xy_cat, order)
    print(f"gather xy-cat last-axis x{n_windows}: {dt*n_windows*1e3:.1f} ms ({dt*1e3:.2f} ea)", flush=True)

    xy_rows = jnp.transpose(xy_cat)  # (N, 48)

    f_gather_rows = jax.jit(lambda v, o: jnp.transpose(v[o]))
    dt, _ = t(f_gather_rows, xy_rows, order)
    print(f"gather rows+transpose x{n_windows}: {dt*n_windows*1e3:.1f} ms ({dt*1e3:.2f} ea)", flush=True)

    # D+E: one full window (bucket totals + weighted sum)
    def f_window(p, dd):
        b = _bucket_totals_fast(curve, JPoint(*p), dd, c)
        return tuple(_weighted_bucket_total(curve, b, c))

    f_window = jax.jit(f_window)
    dt, _ = t(f_window, tuple(pts), d0, iters=1)
    print(f"window total (sort+gather+fold+buckets) x{n_windows}: {dt*n_windows*1e3:.1f} ms ({dt*1e3:.1f} ea)", flush=True)

    # E alone: bucket scans on identity buckets
    buckets = jac.identity(curve, (1 << c,))
    f_buckets = jax.jit(lambda b: tuple(_weighted_bucket_total(curve, JPoint(*b), c)))
    dt, _ = t(f_buckets, tuple(buckets))
    print(f"bucket scans x{n_windows}: {dt*n_windows*1e3:.1f} ms ({dt*1e3:.1f} ea)", flush=True)

    # raw madd throughput: how many madds/s does the Pallas kernel do?
    k = 1 << 15
    P = jac.generator(curve, (k,))
    Q = jac.normalize(curve, jac.generator(curve, (k,)))

    @jax.jit
    def f_madd(p, q):
        def body(acc, _):
            return tuple(jac.madd(curve, JPoint(*acc), JPoint(*q))), None

        out, _ = lax.scan(body, tuple(p), None, length=8)
        return out

    dt, _ = t(f_madd, tuple(P), tuple(Q))
    madds = 8 * k / dt
    print(f"madd throughput: {madds/1e6:.2f} M/s (batch 2^15 x8)", flush=True)
    need = n_windows * n
    print(f"  -> pure-madd floor for this msm: {need/madds*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
