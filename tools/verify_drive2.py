import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.eclair import JaxCompiler, NativeCompiler, R1CSCompiler
from openzl_tpu.ref.poseidon import PoseidonParams
from openzl_tpu.crypto.poseidon import gadget as pg

# NTT on TPU: round trip + naive DFT cross-check (small)
spec = BLS12_381_FR
import random
rng = random.Random(1)
n = 1 << 10
coeffs = [rng.randrange(spec.modulus) for _ in range(n)]
x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
t0 = time.time()
ev = nttmod.ntt(spec, x)
back = limb.unpack_mont(spec, np.asarray(nttmod.intt(spec, ev)))
print("NTT 2^10 roundtrip on TPU:", [int(v) for v in back] == coeffs,
      "(", round(time.time()-t0,1), "s)", flush=True)

# eclair: same Poseidon gadget under Native / Jax(TPU) / R1CS
params = PoseidonParams.generate(BN254_FR, 3, 8, 55)
inputs = [rng.randrange(BN254_FR.modulus) for _ in range(2)]
native = pg.hash(NativeCompiler(BN254_FR), params, inputs)
jx = JaxCompiler(BN254_FR)
jout = pg.hash(jx, params, [jx.constant(v) for v in inputs])
jv = int(limb.unpack_mont(BN254_FR, np.asarray(jout)))
com = R1CSCompiler.for_proofs(BN254_FR)
rout = pg.hash(com, params, [com.secret_witness(v) for v in inputs])
print("eclair 3-way agree:", native == jv == rout.value,
      "| r1cs satisfied:", com.cs.is_satisfied(),
      "| constraints:", com.cs.num_constraints, flush=True)
