"""Round-3 verify drive: witness-calculator prove path on the real TPU.

Checks, on the axon TPU device backend:
  1. Poseidon width-3 BLS12-381 golden permutation (regression anchor).
  2. Groth16 device-backend prove via the NEW tape-replay witness
     calculator (prove_assigned) — proof must verify, fuzzed input must be
     rejected, and the assignment must match the Python re-trace.
  3. div_rem_mod_prime gadget inside a proven circuit.
"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("platform:", jax.devices()[0].platform, flush=True)

# ---- 1. golden permutation anchor -----------------------------------------
import json

import numpy as np

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR

vec = json.loads(
    (pathlib.Path(__file__).parent.parent / "tests/vectors/poseidon_perm_width3_bls381.json").read_text()
)
perm = Poseidon.create(BLS12_381_FR, arity=2)
state = limb.pack_mont(
    BLS12_381_FR, np.array([[int(x)] for x in vec["input"]], dtype=object)
)
out = perm.permute(np.asarray(state))
got = [int(v[0]) for v in limb.unpack_mont(BLS12_381_FR, np.asarray(out))]
want = [int(x) for x in vec["output"]]
assert got == want, f"golden permutation mismatch: {got[0]} != {want[0]}"
print("golden permutation OK (TPU)", flush=True)

# ---- 2+3. Groth16 via witness calculator + div_rem gadget ------------------
from openzl_tpu.crypto.constraint import InputBuilder
from openzl_tpu.crypto.poseidon import gadget as pg
from openzl_tpu.curves import edwards as ed
from openzl_tpu.eclair.gadgets import div_rem_mod_prime
from openzl_tpu.proof_systems import Groth16
from openzl_tpu.ref import pairing as refpair
from openzl_tpu.ref import poseidon as refposeidon

RNG = random.Random(0xD1CE)
g16 = Groth16(refpair.BN254, backend="device")
params = refposeidon.PoseidonParams.generate(g16.fr, 3, 8, 55)
p = g16.fr.modulus
m = ed.BABY_JUBJUB.order
CHAIN = 64


def build(com, witness=None, digest=None):
    h_pub = com.public_input(digest)
    h = com.secret_witness(None if witness is None else witness[0])
    for i in range(CHAIN):
        w = com.secret_witness(None if witness is None else witness[1 + i])
        h = pg.hash(com, params, [h, w])
    # exercise the new Euclidean-reduction gadget inside the proven circuit
    div_rem_mod_prime(com, h, m)
    com.assert_eq(h, h_pub)
    return com.cs


witness = [RNG.randrange(p) for _ in range(CHAIN + 1)]
h = witness[0]
for i in range(CHAIN):
    h = refposeidon.hash(params, [h, witness[1 + i]])
digest = h

setup_cs = build(g16.context_compiler())
print(f"constraints: {setup_cs.num_constraints}", flush=True)
pk = g16.compile(setup_cs, RNG)
print("setup done", flush=True)

calc = g16.witness_calculator(setup_cs)
t0 = time.perf_counter()
z = calc.evaluate([digest], witness, backend="native")
t_wit = time.perf_counter() - t0

# cross-check the tape replay against a Python circuit re-trace
prove_cs = build(g16.proof_compiler(), witness, digest)
assert z == prove_cs.assignment(), "tape replay != python re-trace"
print(f"witness synthesis (native tape): {t_wit*1e3:.1f} ms, matches re-trace", flush=True)

proof = g16.prove_assigned(pk, z, RNG)
inputs = InputBuilder(p).extend_field(digest).build()
assert g16.verify(pk.vk, inputs, proof), "proof did not verify"
assert not g16.verify(pk.vk, [(digest + 1) % p], proof), "fuzzed input accepted"
print("Groth16 prove_assigned on TPU: verify OK, fuzzed input rejected", flush=True)
print("VERIFY DRIVE PASSED", flush=True)
