"""Batched JAX Poseidon permutation vs golden vector and Python oracle."""

import json
import pathlib
import random

import numpy as np

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ref import poseidon as ref_poseidon

VECTORS = pathlib.Path(__file__).parent / "vectors"
RNG = random.Random(7)


def test_permutation_golden_width3():
    with open(VECTORS / "poseidon_perm_width3_bls381.json") as f:
        vec = json.load(f)
    perm = Poseidon.create(BLS12_381_FR, arity=2)
    state = limb.pack_mont(BLS12_381_FR, np.array([[3], [1], [2]], dtype=object))
    out = perm.permute(state)  # (n, 3, 1)
    got = [int(v) for v in limb.unpack_mont(BLS12_381_FR, out)[:, 0]]
    assert got == [int(v) for v in vec["output"]]


def test_permutation_batch_matches_oracle():
    spec = BN254_FR
    perm = Poseidon.create(spec, arity=2)
    params = ref_poseidon.PoseidonParams.generate(spec, 3, 8, 55)
    batch = 5
    states = [[RNG.randrange(spec.modulus) for _ in range(3)] for _ in range(batch)]
    arr = np.array(states, dtype=object).T  # (width, batch)
    out = perm.permute(limb.pack_mont(spec, arr))
    got = limb.unpack_mont(spec, out)
    for b in range(batch):
        expect = ref_poseidon.permute(params, states[b])
        assert [int(got[i, b]) for i in range(3)] == expect


def test_hash_matches_oracle_and_domain_tag():
    spec = BN254_FR
    perm = Poseidon.create(spec, arity=2)
    params = ref_poseidon.PoseidonParams.generate(spec, 3, 8, 55)
    inputs = [[RNG.randrange(spec.modulus) for _ in range(2)] for _ in range(3)]
    arr = np.array(inputs, dtype=object).T  # (arity, batch)
    digest = perm.hash(limb.pack_mont(spec, arr))
    got = limb.unpack_mont(spec, digest)
    for b, inp in enumerate(inputs):
        assert int(got[b]) == ref_poseidon.hash(params, inp)


def test_hash_single_unbatched():
    spec = BLS12_381_FR
    perm = Poseidon.create(spec, arity=2)
    params = ref_poseidon.PoseidonParams.generate(spec, 3, 8, 55)
    inp = [123456789, 987654321]
    digest = perm.hash(limb.pack_mont(spec, np.array(inp, dtype=object)))
    assert int(limb.unpack_mont(spec, digest)) == ref_poseidon.hash(params, inp)
