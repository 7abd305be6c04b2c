"""MSM 2^20 A/B sweep: window bits x window-group cap.

Round-3 regression hunt (VERDICT r3 item 2): the grouped-window path at
2^20 (group=2, 1 GB gathered rows per group step) measured ~1.1 s slower
than 17x the ungrouped single-window pipeline. Sweeps the REAL _msm_jit
over (c, _GROUP_ELEMS_CAP) combos on one point set, clearing the jit trace
cache between configs so the group choice re-traces.

Run: python experiments/msm_ab_sweep20.py [--log-n 20]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.ops import msm as msmmod
from openzl_tpu.ref import curve as refc


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    curve = BLS12_381_G1
    n = 1 << args.log_n
    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    d = rng.integers(1, 1 << 63, size=n, dtype=np.uint64)
    dk = limb.pack(curve.scalar, d.astype(object))
    pts = msmmod.fixed_base_msm(curve, jnp.asarray(dk), n_bits=64)
    fence(pts)
    r = curve.scalar.modulus
    s = [int(x) for x in rng.integers(0, 1 << 62, size=n, dtype=np.int64)]
    s = [(si * 0x9E3779B97F4A7C15) % r for si in s]
    sk = jax.device_put(jnp.asarray(limb.pack(curve.scalar, np.array(s, dtype=object))))
    want_scalar = sum(si * int(di) for si, di in zip(s, d)) % r
    want = refc.scalar_mul(curve, want_scalar, refc.generator(curve))
    print("points built", flush=True)

    # (window_bits, group cap): None = module default
    configs = [
        (None, None),        # current default: c=15, group=2 at 2^20
        (None, 1),           # c=15, group FORCED to 1
        (13, 1),             # parts=2, ungrouped
        (12, 1),             # parts=1, ungrouped
        (13, None),          # parts=2, grouped
        (None, 1 << 22),     # c=15, group=4 (bigger steps)
    ]
    default_cap = msmmod._GROUP_ELEMS_CAP
    for c, cap in configs:
        msmmod._GROUP_ELEMS_CAP = (
            default_cap if cap is None else (n if cap == 1 else cap)
        )
        if cap == 1:
            msmmod._GROUP_ELEMS_CAP = 1  # group = max(1, cap//n) = 1
        msmmod._msm_jit.clear_cache()
        try:
            t0 = time.perf_counter()
            out = msmmod._msm_jit(curve, sk, pts, c, None)
            fence(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = msmmod._msm_jit(curve, sk, pts, c, None)
            fence(out)
            dt = (time.perf_counter() - t0) / args.iters
            ok = jac.to_affine_ints(curve, out) == want
            print(
                f"c={c} cap={cap}: {dt*1e3:.1f} ms ok={ok} "
                f"(first {compile_s:.1f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"c={c} cap={cap}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            msmmod._GROUP_ELEMS_CAP = default_cap


if __name__ == "__main__":
    main()
