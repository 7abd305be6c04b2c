import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)
from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR

t0=time.time()
perm = Poseidon.create(BLS12_381_FR, arity=2)
state = limb.pack_mont(BLS12_381_FR, np.array([[3],[1],[2]], dtype=object))
out = jax.jit(perm.permute)(state)
got = [int(v) for v in limb.unpack_mont(BLS12_381_FR, out)[:, 0]]
expect = [1808609226548932412441401219270714120272118151392880709881321306315053574086,
          13469396364901763595452591099956641926259481376691266681656453586107981422876,
          28037046374767189790502007352434539884533225547205397602914398240898150312947]
print("TPU golden vector match:", got == expect, " (compile+run", round(time.time()-t0,1), "s)", flush=True)

from openzl_tpu.ref import poseidon as ref_p
params = ref_p.PoseidonParams.generate(BN254_FR, 3, 8, 55)
pb = Poseidon.create(BN254_FR, arity=2)
edge = [[0, 0], [BN254_FR.modulus - 1, BN254_FR.modulus - 1], [1, 0]]
arr = limb.pack_mont(BN254_FR, np.array(edge, dtype=object).T)
dig = jax.jit(pb.hash)(arr)
gd = limb.unpack_mont(BN254_FR, dig)
print("edge hash match:", all(int(gd[i]) == ref_p.hash(params, e) for i, e in enumerate(edge)), flush=True)

B = 1 << 15
rng = np.random.RandomState(0)
vals = rng.randint(0, 1 << 16, size=(16, 3, B)).astype(np.uint32)
stj = jax.device_put(vals)
f = jax.jit(pb.permute)
t0 = time.time(); f(stj).block_until_ready(); print("batch compile+first run", round(time.time()-t0, 2), "s", flush=True)
t0 = time.time(); n = 5
for _ in range(n): r = f(stj)
r.block_until_ready()
dt = (time.time()-t0)/n
print(f"perm throughput: {B/dt/1e6:.3f} M perms/s (batch {B})", flush=True)
