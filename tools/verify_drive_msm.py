"""/verify drive for the MSM pipeline rework (row gather + part-split sort
+ shared-scalar multi-set MSM) on the real TPU.

Checks, all against the pure-Python oracle / golden vectors:
  1. Poseidon width-3 BLS12-381 golden permutation (library anchor).
  2. msm() at n=2^12 BLS12-381 G1 vs the known-dlog construction.
  3. msm_multi() (3 sets incl. per-set identity points) vs per-set oracle.
"""

import pathlib
import random
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
from openzl_tpu.ref import curve as refc

print("platform:", jax.devices()[0].platform, flush=True)

# -- 1. Poseidon golden anchor ------------------------------------------------
from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields.spec import BLS12_381_FR

perm = Poseidon.create(BLS12_381_FR, arity=2)
state = limb.pack_mont(BLS12_381_FR, np.array([[3], [1], [2]], dtype=object))
out = jax.jit(perm.permute)(state)
got = [int(v) for v in limb.unpack_mont(BLS12_381_FR, out)[:, 0]]
want0 = 1808609226548932412441401219270714120272118151392880709881321306315053574086
assert got[0] == want0, got
print("poseidon golden vector OK", flush=True)

# -- 2/3. MSM + msm_multi on the TPU -----------------------------------------
curve = BLS12_381_G1
RNG = random.Random(42)
n = 1 << 12
ks = [RNG.randrange(1, 1 << 30) for _ in range(n)]
scal_k = np.asarray(limb.pack(curve.scalar, np.array(ks, dtype=object)))
pts = msmmod.fixed_base_msm(curve, scal_k, n_bits=30)
r_mod = curve.scalar.modulus
ss = [RNG.randrange(1, r_mod) for _ in range(n)]
scal = np.asarray(limb.pack(curve.scalar, np.array(ss, dtype=object)))

t0 = time.perf_counter()
out = msmmod.msm(curve, scal, pts)
got = jac.to_affine_ints(curve, out)
print(f"msm 2^12 wall {time.perf_counter()-t0:.1f}s (cold)", flush=True)
want_k = sum(a * b for a, b in zip(ks, ss)) % r_mod
want = refc.scalar_mul(curve, want_k, refc.generator(curve))
assert got == want, "msm mismatch"
print("msm 2^12 dlog check OK", flush=True)

# multi-set: 3 sets = slices of pts with per-set identities
F = jac.field_ops(curve)
sets = []
wants = []
for s in range(3):
    mask = [(i % (5 + s)) != 0 for i in range(n)]
    px = pts.x
    pz = jac.JPoint(
        pts.x,
        pts.y,
        F.select(np.array(mask), pts.z, F.zeros((n,))),
    )
    sets.append(pz)
    w = sum(a * b for a, b, m in zip(ks, ss, mask) if m) % r_mod
    wants.append(refc.scalar_mul(curve, w, refc.generator(curve)))

t0 = time.perf_counter()
outs = msmmod.msm_multi(curve, scal, sets)
for o, w in zip(outs, wants):
    assert jac.to_affine_ints(curve, o) == w, "msm_multi mismatch"
print(f"msm_multi 3x2^12 OK, wall {time.perf_counter()-t0:.1f}s (cold)", flush=True)
print("VERIFY DRIVE PASSED", flush=True)
