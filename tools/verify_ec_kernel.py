"""Drive the Mosaic-compiled EC kernels on the real TPU.

Checks add/madd/dbl for BLS12-381 G1 and BN254 G1 against the Python-int
oracle (mask cases included), then times an MSM 2^16 end-to-end with the
kernels active. Run serially (one JAX process).
"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from openzl_tpu.curves import BLS12_381_G1, BLS12_381_G2, BN254_G1
from openzl_tpu.curves import jacobian as jac
from openzl_tpu.fields import limb
from openzl_tpu.ops import ec_kernel
from openzl_tpu.ops.msm import msm, fixed_base_msm
from openzl_tpu.ref import curve as ref

RNG = random.Random(0xEC1)


def check_ops(curve):
    n = 8
    pts = [ref.random_point(curve, RNG) for _ in range(n)]
    qts = [ref.random_point(curve, RNG) for _ in range(n)]
    pts[0] = None
    qts[1] = None
    qts[2] = pts[2]
    p = curve.base.modulus
    if curve.ext == 1:
        qts[3] = (pts[3][0], p - pts[3][1])
    else:
        y0, y1 = pts[3][1]
        qts[3] = (pts[3][0], ((p - y0) % p, (p - y1) % p))
    P = jac.from_affine_ints(curve, pts)
    Q = jac.from_affine_ints(curve, qts)
    for mode in ("add", "madd"):
        got = jac.JPoint(
            *ec_kernel.ec_op(curve.base, mode, P.x, P.y, P.z, Q.x, Q.y, Q.z)
        )
        want = [ref.add(curve, a, b) for a, b in zip(pts, qts)]
        assert jac.to_affine_ints(curve, got) == want, f"{curve.name} {mode}"
        print(f"{curve.name} {mode}: ok", flush=True)
    got = jac.JPoint(*ec_kernel.ec_op(curve.base, "dbl", P.x, P.y, P.z))
    want = [ref.add(curve, a, a) for a in pts]
    assert jac.to_affine_ints(curve, got) == want, f"{curve.name} dbl"
    print(f"{curve.name} dbl: ok", flush=True)


def time_msm(curve, log_n=16):
    r = curve.scalar.modulus
    rng = np.random.default_rng(7)
    n = 1 << log_n
    d = rng.integers(1, 1 << 63, size=n, dtype=np.uint64)
    dk = limb.pack(curve.scalar, d.astype(object))
    pts = fixed_base_msm(curve, jnp.asarray(dk), n_bits=64)
    np.asarray(pts.x[0, :1])
    s = [int(x) for x in rng.integers(0, 1 << 62, size=n, dtype=np.int64)]
    s = [(si * 0x9E3779B97F4A7C15) % r for si in s]
    sk = jnp.asarray(limb.pack(curve.scalar, np.array(s, dtype=object)))
    out = msm(curve, sk, pts)
    np.asarray(out.x[:1])
    t0 = time.perf_counter()
    out = msm(curve, sk, pts)
    np.asarray(out.x[:1])
    dt = time.perf_counter() - t0
    got = jac.to_affine_ints(curve, out)
    want_scalar = sum(si * int(di) for si, di in zip(s, d)) % r
    want = ref.scalar_mul(curve, want_scalar, ref.generator(curve))
    assert got == want, "MSM dlog check failed"
    print(
        f"msm {curve.name} 2^{log_n}: {dt*1e3:.1f} ms"
        f" ({n/dt:,.0f} pts/s), dlog ok",
        flush=True,
    )


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    assert jax.default_backend() == "tpu", "EC kernels need the TPU backend"
    check_ops(BN254_G1)
    check_ops(BLS12_381_G1)
    check_ops(BLS12_381_G2)
    time_msm(BLS12_381_G1, 16)
    time_msm(BLS12_381_G2, 14)
    print("EC kernel drive: ALL OK", flush=True)


if __name__ == "__main__":
    main()
