"""MSM 2^20 window-bit sweep: packed-sort (c<=12) vs argsort (c=14) paths.

Hypothesis: at n=2^20 the default c=14 forces the (digit,index) sort to
fall back to a two-array argsort (c + idx_bits = 34 > 32), doubling sort
traffic across ~19 windows; c=12 keeps the single-array packed sort at ~8%
more EC adds. Measures wall-clock for c in {12, 13, 14} plus the current
default, and checks results against the known-dlog construction.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.ops import msm as msmmod

print("platform:", jax.devices()[0].platform, flush=True)

curve = BLS12_381_G1
n = 1 << 20
rng = np.random.default_rng(7)

# known-dlog points: P_i = k_i * G with random small k via fixed-base eval
ks = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
ks_obj = np.array([int(k) for k in ks], dtype=object)
scal_k = np.asarray(limb.pack(curve.scalar, ks_obj))
pts = msmmod.fixed_base_msm(curve, scal_k, n_bits=30)
jax.block_until_ready(pts.x)
print("points built", flush=True)

# full-width scalars (matches tools/bench_scale.py)
r_mod = curve.scalar.modulus
pyrng = __import__("random").Random(11)
ss = [pyrng.randrange(1, r_mod) for _ in range(n)]
ss_obj = np.array(ss, dtype=object)
scal_s = np.asarray(limb.pack(curve.scalar, ss_obj))
want_k = sum(int(a) * b for a, b in zip(ks, ss)) % r_mod

def fence(out):
    # the axon relay's block_until_ready does not reliably fence (see
    # docs/performance.md); force a device->host readback instead
    np.asarray(out.x)


scal_dev = jax.device_put(scal_s)
pts_dev = jax.tree_util.tree_map(jax.device_put, pts)
fence(pts_dev)

for c in (None, 12, 13, 14):
    out = msmmod.msm(curve, scal_dev, pts_dev, window_bits=c)
    fence(out)
    t0 = time.perf_counter()
    ITERS = 3
    for _ in range(ITERS):
        out = msmmod.msm(curve, scal_dev, pts_dev, window_bits=c)
        fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    got = jac.to_affine_ints(curve, out)
    from openzl_tpu.ref import curve as refc

    want = refc.scalar_mul(curve, want_k, refc.generator(curve))
    ok = got == want
    print(f"c={c}: {dt*1e3:.1f} ms ok={ok}", flush=True)
