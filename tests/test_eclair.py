"""ECLAIR-equivalent layer: native/JAX/R1CS agreement + satisfiability oracle.

Mirrors the reference's test strategy (SURVEY.md section 4): the R1CS built in
prove mode must be satisfied (constraint/mod.rs:101-107), native and traced
semantics must agree (the Rust-generics guarantee re-created by testing), and
fuzzed assignments must fail.
"""

import random

import numpy as np
import pytest

from openzl_tpu.eclair import (
    JaxCompiler,
    NativeCompiler,
    R1CSCompiler,
)
from openzl_tpu.eclair.measure import Instrument, measure_constraints
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.ref.poseidon import PoseidonParams
from openzl_tpu.crypto.poseidon import gadget as poseidon_gadget
from openzl_tpu.crypto.merkle import gadget as merkle_gadget
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree

SPEC = BN254_FR
RNG = random.Random(0xEC1A)


def r(n=1):
    return [RNG.randrange(SPEC.modulus) for _ in range(n)]


# ---------------------------------------------------------------------------
# primitive ops agree across compilers
# ---------------------------------------------------------------------------


def eval_jax(fn, *int_args):
    com = JaxCompiler(SPEC)
    vals = [com.constant(x) for x in int_args]
    out = fn(com, *vals)
    return int(limb.unpack_mont(SPEC, np.asarray(out)))


def eval_native(fn, *int_args):
    com = NativeCompiler(SPEC)
    return fn(com, *int_args)


def eval_r1cs(fn, *int_args):
    com = R1CSCompiler.for_proofs(SPEC)
    vals = [com.secret_witness(x) for x in int_args]
    out = fn(com, *vals)
    assert com.cs.is_satisfied()
    return out.value


@pytest.mark.parametrize(
    "name,fn,arity",
    [
        ("add", lambda c, a, b: c.add(a, b), 2),
        ("sub", lambda c, a, b: c.sub(a, b), 2),
        ("mul", lambda c, a, b: c.mul(a, b), 2),
        ("neg", lambda c, a: c.neg(a), 1),
        ("square", lambda c, a: c.square(a), 1),
        ("pow5", lambda c, a: c.pow5(a), 1),
        ("inv", lambda c, a: c.inv(a), 1),
        ("addc", lambda c, a: c.add_const(a, 12345), 1),
        ("mulc", lambda c, a: c.mul_const(a, 98765), 1),
    ],
)
def test_ops_agree(name, fn, arity):
    args = r(arity)
    want = eval_native(fn, *args)
    assert eval_jax(fn, *args) == want
    assert eval_r1cs(fn, *args) == want


def test_select_swap_agree():
    a, b = r(2)
    for bit in (False, True):
        native = NativeCompiler(SPEC)
        want_sel = native.select(bit, a, b)
        want_swap = native.swap(bit, a, b)

        com = R1CSCompiler.for_proofs(SPEC)
        bv = com.alloc_bit(bit)
        av, bvv = com.secret_witness(a), com.secret_witness(b)
        got_sel = com.select(bv, av, bvv)
        l, rr = com.swap(bv, av, bvv)
        assert com.cs.is_satisfied()
        assert got_sel.value == want_sel
        assert (l.value, rr.value) == want_swap

        jx = JaxCompiler(SPEC)
        import jax.numpy as jnp

        sel = jx.select(jnp.asarray(bit), jx.constant(a), jx.constant(b))
        assert int(limb.unpack_mont(SPEC, np.asarray(sel))) == want_sel


def test_bits_roundtrip_and_range():
    x = RNG.randrange(1 << 64)
    native = NativeCompiler(SPEC)
    bits = native.to_bits_le(x, 64)
    assert native.from_bits_le(bits) == x

    com = R1CSCompiler.for_proofs(SPEC)
    xv = com.secret_witness(x)
    bv = com.to_bits_le(xv, 64)
    assert com.cs.is_satisfied()
    assert [b.value for b in bv] == [int(b) for b in bits]
    # in range passes
    com.assert_within_bit_range(xv, 64)
    assert com.cs.is_satisfied()

    jx = JaxCompiler(SPEC)
    jbits = jx.to_bits_le(jx.constant(x), 64)
    assert [bool(b) for b in jbits] == bits
    back = jx.from_bits_le(jbits)
    assert int(limb.unpack_mont(SPEC, np.asarray(back))) == x


def test_range_assert_fails_out_of_range():
    com = R1CSCompiler.for_proofs(SPEC)
    xv = com.secret_witness(1 << 20)
    com.assert_within_bit_range(xv, 16)
    assert not com.cs.is_satisfied()


def test_is_eq_is_zero():
    a = r(1)[0]
    for x, y, want in [(a, a, 1), (a, (a + 1) % SPEC.modulus, 0), (0, 0, 1)]:
        com = R1CSCompiler.for_proofs(SPEC)
        z = com.is_eq(com.secret_witness(x), com.secret_witness(y))
        assert com.cs.is_satisfied()
        assert z.value == want


def test_assert_eq_unsatisfied_on_mismatch():
    a, b = r(2)
    com = R1CSCompiler.for_proofs(SPEC)
    com.assert_eq(com.secret_witness(a), com.secret_witness(b))
    assert com.cs.is_satisfied() == (a == b)


def test_boolean_ops():
    for x in (False, True):
        for y in (False, True):
            native = NativeCompiler(SPEC)
            com = R1CSCompiler.for_proofs(SPEC)
            bx, by = com.alloc_bit(x), com.alloc_bit(y)
            assert com.and_(bx, by).value == int(native.and_(x, y))
            assert com.or_(bx, by).value == int(native.or_(x, y))
            assert com.xor_(bx, by).value == int(native.xor_(x, y))
            assert com.not_(bx).value == int(native.not_(x))
            assert com.cs.is_satisfied()


# ---------------------------------------------------------------------------
# Poseidon gadget: identical output under all three compilers
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pos_params():
    return PoseidonParams.generate(SPEC, width=3, full_rounds=8, partial_rounds=55)


def test_poseidon_gadget_three_ways(pos_params):
    inputs = r(2)
    native = poseidon_gadget.hash(NativeCompiler(SPEC), pos_params, inputs)

    jx = JaxCompiler(SPEC)
    jout = poseidon_gadget.hash(jx, pos_params, [jx.constant(v) for v in inputs])
    assert int(limb.unpack_mont(SPEC, np.asarray(jout))) == native

    com = R1CSCompiler.for_proofs(SPEC)
    vars_ = [com.secret_witness(v) for v in inputs]
    out = poseidon_gadget.hash(com, pos_params, vars_)
    assert com.cs.is_satisfied()
    assert out.value == native


def test_poseidon_gadget_matches_batched_kernel(pos_params):
    from openzl_tpu.crypto.poseidon.permutation import Poseidon

    inputs = r(2)
    native = poseidon_gadget.hash(NativeCompiler(SPEC), pos_params, inputs)
    perm = Poseidon.create(SPEC, arity=2)
    packed = limb.pack_mont(SPEC, np.array([[v] for v in inputs], dtype=object))
    kout = perm.hash(packed)
    assert int(limb.unpack_mont(SPEC, np.asarray(kout))[0]) == native


def test_poseidon_constraint_count(pos_params):
    """79 S-boxes x 3 constraints, minus the first-round domain-tag S-box
    which constant-folds (the tag is a compile-time constant; arkworks'
    FpVar does the same folding): 3 * 78 = 234."""
    com = R1CSCompiler.for_proofs(SPEC)
    vars_ = [com.secret_witness(v) for v in r(2)]
    _, size = measure_constraints(
        com, poseidon_gadget.hash, com, pos_params, vars_
    )
    n_sboxes = 8 * 3 + 55 - 1
    assert size.constraints == 3 * n_sboxes


# ---------------------------------------------------------------------------
# Merkle membership circuit: prove-mode satisfiability + fuzzed negatives
# ---------------------------------------------------------------------------


def test_merkle_membership_circuit(pos_params):
    height = 6
    params = MerkleParameters(SPEC, height)
    leaves = r(9)
    tree = MerkleTree.from_leaf_digests(
        params, limb.pack_mont(SPEC, np.array(leaves, dtype=object))
    )
    root = int(limb.unpack_mont(SPEC, tree.root()))
    index = 5
    path = tree.path(index)
    sibling = int(limb.unpack_mont(SPEC, path.sibling_digest))
    inner = [
        int(v) for v in limb.unpack_mont(SPEC, path.inner_path)
    ]
    bits = [(index >> l) & 1 for l in range(height - 1)]

    # native check
    native = NativeCompiler(SPEC)
    computed = merkle_gadget.path_root(
        native, pos_params, leaves[index], sibling, inner, [bool(b) for b in bits]
    )
    assert computed == root

    # circuit check: root public, everything else secret
    com = R1CSCompiler.for_proofs(SPEC)
    root_v = com.public_input(root)
    leaf_v = com.secret_witness(leaves[index])
    sib_v = com.secret_witness(sibling)
    inner_v = [com.secret_witness(v) for v in inner]
    bit_v = [com.alloc_bit(bool(b)) for b in bits]
    inst = Instrument(com)
    with inst.span("merkle_membership"):
        merkle_gadget.assert_membership(
            com, pos_params, root_v, leaf_v, sib_v, inner_v, bit_v
        )
    assert com.cs.is_satisfied()
    # height-1 = 5 joins at 234 constraints each + 5 swaps + 1 final eq
    # (bit booleanity was charged at alloc_bit time, outside the span)
    assert inst.measurements[0][1].constraints == 5 * 234 + 5 + 1

    # fuzzed public input must NOT satisfy (reference constraint.rs:384-405)
    com2 = R1CSCompiler.for_proofs(SPEC)
    root_bad = com2.public_input((root + 1) % SPEC.modulus)
    leaf_v = com2.secret_witness(leaves[index])
    sib_v = com2.secret_witness(sibling)
    inner_v = [com2.secret_witness(v) for v in inner]
    bit_v = [com2.alloc_bit(bool(b)) for b in bits]
    merkle_gadget.assert_membership(
        com2, pos_params, root_bad, leaf_v, sib_v, inner_v, bit_v
    )
    assert not com2.cs.is_satisfied()


def test_setup_and_prove_shapes_match(pos_params):
    """Setup-mode trace (no values) must produce the same constraint system
    shape as prove mode — the two-compiler lifecycle of `ProofSystem::compile`
    vs `prove` (reference groth16.rs:417-425)."""

    def build(com, known):
        root_v = com.public_input(123 if known else None)
        a = com.secret_witness(5 if known else None)
        b = com.secret_witness(7 if known else None)
        h = poseidon_gadget.hash(com, pos_params, [a, b])
        com.assert_eq(h, root_v)
        return com

    setup = build(R1CSCompiler.for_contexts(SPEC), known=False)
    prove = build(R1CSCompiler.for_proofs(SPEC), known=True)
    assert setup.cs.num_constraints == prove.cs.num_constraints
    assert setup.cs.num_instance == prove.cs.num_instance
    assert setup.cs.num_witness == prove.cs.num_witness
    for (a1, b1, c1), (a2, b2, c2) in zip(setup.cs.constraints, prove.cs.constraints):
        assert a1.terms == a2.terms and b1.terms == b2.terms and c1.terms == c2.terms
