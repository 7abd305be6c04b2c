"""Witness calculator: tape replay must reproduce prove-mode assignments.

The tape (eclair/r1cs.py R1CS.hints) is recorded during circuit build; the
calculator re-derives every derived witness from leaves alone, in Python and
through native/witness.cpp. Reference behavior being replaced: re-running
circuit synthesis per proof (plugins/arkworks/src/constraint/mod.rs:179-197).
"""

import random

import pytest

from openzl_tpu import native
from openzl_tpu.crypto.poseidon import gadget as poseidon_gadget
from openzl_tpu.curves import edwards as ed
from openzl_tpu.eclair.compilers import R1CSCompiler
from openzl_tpu.eclair.gadgets import div_rem_mod_prime
from openzl_tpu.eclair.witness import WitnessCalculator
from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.ref.poseidon import PoseidonParams

RNG = random.Random(0x717)


@pytest.fixture(scope="module")
def pos_params():
    return PoseidonParams.generate(BN254_FR, 3, 8, 55)


def test_tape_replay_matches_prove_assignment(pos_params):
    """Circuit touching every tape op: hash chain + iszero + bits + inv +
    divmod, built twice (prove mode for the oracle, setup for the tape)."""
    p = BN254_FR.modulus
    digest_v = RNG.randrange(p)
    a_v, b_v, c_v = (RNG.randrange(p) for _ in range(3))

    def build(com, known):
        digest = com.public_input(digest_v if known else None)
        a = com.secret_witness(a_v if known else None)
        b = com.secret_witness(b_v if known else None)
        c = com.secret_witness(c_v if known else None)
        h = poseidon_gadget.hash(com, pos_params, [a, b])
        h = poseidon_gadget.hash(com, pos_params, [h, c])
        flag = com.is_zero(com.sub(h, digest))
        com.to_bits_le(flag, 1)
        inv = com.inv(com.add_const(com.mul(a, b), 1))
        div_rem_mod_prime(com, com.mul(inv, c), ed.BABY_JUBJUB.order)
        return com

    prove = build(R1CSCompiler.for_proofs(BN254_FR), True)
    expected = prove.cs.assignment()

    setup = build(R1CSCompiler.for_contexts(BN254_FR), False)
    calc = WitnessCalculator(setup.cs)
    assert calc.num_leaves == 3
    leaves = [a_v, b_v, c_v]

    z_py = calc.evaluate([digest_v], leaves, backend="python")
    assert z_py == expected

    if native.available():
        z_nat = calc.evaluate([digest_v], leaves, backend="native")
        assert z_nat == expected


def test_leaf_values_roundtrip(pos_params):
    p = BN254_FR.modulus
    com = R1CSCompiler.for_proofs(BN254_FR)
    x = com.secret_witness(1234)
    y = com.secret_witness(5678)
    poseidon_gadget.hash(com, pos_params, [x, y])
    calc = WitnessCalculator(com.cs)
    leaves = calc.leaf_values(com.cs)
    assert leaves == [1234, 5678]
    z = calc.evaluate([], leaves, backend="python")
    assert z == com.cs.assignment()


def test_native_divmod_and_inv_edge_cases():
    if not native.available():
        pytest.skip("native library not built")
    p = BN254_FR.modulus
    m = ed.BABY_JUBJUB.order
    for x in (0, 1, m - 1, m, m + 1, p - 1):
        com = R1CSCompiler.for_contexts(BN254_FR)
        xv = com.secret_witness(None)
        div_rem_mod_prime(com, xv, m)
        calc = WitnessCalculator(com.cs)
        z = calc.evaluate([], [x], backend="native")
        assert z == calc.evaluate([], [x], backend="python")
        # q, r really are divmod(x, m)
        q, r = divmod(x, m)
        assert (q % p) in z and (r % p) in z


def test_evaluate_limbs_matches_int_assignment(pos_params):
    """evaluate_limbs (the bytes->u16-view prove input) must equal the
    packed int assignment exactly."""
    if not native.available():
        pytest.skip("native library not built")
    import numpy as np

    from openzl_tpu.fields import limb as limbmod

    p = BN254_FR.modulus

    def build(com, vals=None):
        a = com.secret_witness(None if vals is None else vals[0])
        b = com.secret_witness(None if vals is None else vals[1])
        h = poseidon_gadget.hash(com, pos_params, [a, b])
        com.inv(com.add_const(h, 3))
        return com

    setup = build(R1CSCompiler.for_contexts(BN254_FR))
    calc = WitnessCalculator(setup.cs)
    leaves = [RNG.randrange(p) for _ in range(2)]
    z_int = calc.evaluate([], leaves)
    got = calc.evaluate_limbs([], leaves)
    want = limbmod.pack(BN254_FR, np.array(z_int, dtype=object))
    assert got.dtype == np.uint32 and got.shape == want.shape
    assert np.array_equal(got, want)


def test_native_zero_inverse_raises():
    if not native.available():
        pytest.skip("native library not built")
    com = R1CSCompiler.for_contexts(BN254_FR)
    a = com.secret_witness(None)
    com.inv(a)
    calc = WitnessCalculator(com.cs)
    with pytest.raises(ZeroDivisionError):
        calc.evaluate([], [0], backend="native")
    with pytest.raises(ValueError):
        calc.evaluate([], [0], backend="python")
