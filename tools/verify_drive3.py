"""Round-2 verify drive: golden Poseidon anchor + the surfaces changed by
the work-efficient scan rewrite (MSM, segmented sparse matvec, NTT), all on
the real TPU chip."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import random
import time

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR

# 1. golden permutation anchor
t0 = time.time()
perm = Poseidon.create(BLS12_381_FR, arity=2)
state = limb.pack_mont(BLS12_381_FR, np.array([[3], [1], [2]], dtype=object))
out = jax.jit(perm.permute)(state)
got = [int(v) for v in limb.unpack_mont(BLS12_381_FR, out)[:, 0]]
expect = [1808609226548932412441401219270714120272118151392880709881321306315053574086,
          13469396364901763595452591099956641926259481376691266681656453586107981422876,
          28037046374767189790502007352434539884533225547205397602914398240898150312947]
assert got == expect, "golden vector mismatch"
print("golden vector: OK (", round(time.time() - t0, 1), "s)", flush=True)

# 2. MSM with the chunked scan, dlog-checked (points d_i * G)
from openzl_tpu.curves import BLS12_381_G1
from openzl_tpu.curves import jacobian as jac
from openzl_tpu.ops.msm import msm
from openzl_tpu.ref import curve as refc

curve = BLS12_381_G1
rng = random.Random(7)
n = 1 << 12
r_ord = curve.scalar.modulus
d = [rng.randrange(1, r_ord) for _ in range(n)]
s = [rng.randrange(r_ord) for _ in range(n)]
t0 = time.time()
G = jac.generator(curve, (n,))
pts = jac.scalar_mul(curve, limb.pack(curve.scalar, np.array(d, dtype=object)), G)
sk = limb.pack(curve.scalar, np.array(s, dtype=object))
outp = msm(curve, sk, pts)
got_pt = jac.to_affine_ints(curve, outp)
want_scalar = sum(si * di for si, di in zip(s, d)) % r_ord
want_pt = refc.scalar_mul(curve, want_scalar, refc.generator(curve))
assert got_pt == want_pt, "MSM dlog check failed"
print("MSM 2^12 dlog check: OK (", round(time.time() - t0, 1), "s)", flush=True)

# 3. sparse matvec (pow2-padded nnz) vs host oracle
from openzl_tpu.ops.sparse import SparseFieldMatrix

spec = BN254_FR
p = spec.modulus
rows, cols, vals = [], [], []
n_rows, n_cols = 300, 200
for _ in range(997):  # odd nnz -> exercises the pow2 padding
    rows.append(rng.randrange(n_rows))
    cols.append(rng.randrange(n_cols))
    vals.append(rng.randrange(p))
m = SparseFieldMatrix.from_coo(spec, rows, cols, vals, n_rows, n_cols)
z = [rng.randrange(p) for _ in range(n_cols)]
zm = jax.numpy.asarray(limb.pack_mont(spec, np.array(z, dtype=object)))
got_v = [int(x) for x in limb.unpack_mont(spec, np.asarray(m.matvec(zm)))]
want_v = [0] * n_rows
for r_, c_, v_ in zip(rows, cols, vals):
    want_v[r_] = (want_v[r_] + v_ * z[c_]) % p
assert got_v == want_v, "sparse matvec mismatch"
mt = m.transpose()
got_t = [int(x) for x in limb.unpack_mont(
    spec, np.asarray(mt.matvec(jax.numpy.asarray(
        limb.pack_mont(spec, np.array([rng.randrange(p) for _ in range(n_rows)],
                                      dtype=object)))))
)]
print("sparse matvec + transpose: OK", flush=True)

# 4. NTT round-trip at 2^14
from openzl_tpu.ops import ntt as nttmod

fr = BLS12_381_FR
nn = 1 << 14
coeffs = np.array([rng.randrange(fr.modulus) for _ in range(nn)], dtype=object)
x = jax.numpy.asarray(limb.pack_mont(fr, coeffs))
t0 = time.time()
y = nttmod.ntt(fr, x)
back = nttmod.intt(fr, y)
assert np.array_equal(np.asarray(back), np.asarray(x)), "NTT roundtrip failed"
print("NTT 2^14 roundtrip: OK (", round(time.time() - t0, 1), "s)", flush=True)

print("VERIFY DRIVE 3: ALL OK", flush=True)
