"""Follow-up to msm_ab_sweep20: c=12 group policy at 2^20 + regression
check that the new non-splitting default keeps 2^16/2^18 fast.

Run: python experiments/msm_c12_probe.py
"""

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


def bench_one(curve, log_n, c, cap, iters=3):
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
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

    default_cap = msmmod._GROUP_ELEMS_CAP
    msmmod._GROUP_ELEMS_CAP = cap if cap is not None else default_cap
    msmmod._msm_jit.clear_cache()
    try:
        t0 = time.perf_counter()
        out = msmmod._msm_jit(curve, sk, pts, c, None)
        fence(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = msmmod._msm_jit(curve, sk, pts, c, None)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        ok = jac.to_affine_ints(curve, out) == want
        print(
            f"2^{log_n} c={c} cap={cap}: {dt*1e3:.1f} ms ok={ok}"
            f" (first {compile_s:.1f}s)",
            flush=True,
        )
    finally:
        msmmod._GROUP_ELEMS_CAP = default_cap


def main():
    curve = BLS12_381_G1
    print("platform:", jax.devices()[0].platform, flush=True)
    print("default c at 2^20:", msmmod._default_window_bits(1 << 20), flush=True)
    print("default c at 2^18:", msmmod._default_window_bits(1 << 18), flush=True)
    print("default c at 2^16:", msmmod._default_window_bits(1 << 16), flush=True)
    # group policy at the flagship size under the new default c
    bench_one(curve, 20, None, 1)        # group=1
    bench_one(curve, 20, None, None)     # default cap -> group=2 at c=12
    # regression check at the mid sizes with the NEW default c
    bench_one(curve, 18, None, None)
    bench_one(curve, 16, None, None)


if __name__ == "__main__":
    main()
