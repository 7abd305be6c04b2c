"""Groth16 end-to-end: prove/verify round trip, fuzzed rejection,
serialization, and the eclair Poseidon-preimage circuit (BASELINE.md
config: proof of knowledge of a Poseidon preimage)."""

import random

import pytest

pytestmark = pytest.mark.heavy

from openzl_tpu.crypto.constraint import InputBuilder, verify_fuzz_public_input
from openzl_tpu.crypto.poseidon import gadget as poseidon_gadget
from openzl_tpu.proof_systems import Groth16, Proof, VerifyingKey
from openzl_tpu.ref import pairing as refpair
from openzl_tpu.ref.poseidon import PoseidonParams
from openzl_tpu.utils.rand import fuzz_vector

RNG = random.Random(0x616)


@pytest.fixture(scope="module", params=["bls12_381", "bn254"])
def g16(request):
    spec = refpair.BLS12_381 if request.param == "bls12_381" else refpair.BN254
    return Groth16(spec)


def build_cubic(com, x=None, y=None):
    """public y, secret x, assert x^3 = y."""
    yv = com.public_input(y)
    xv = com.secret_witness(x)
    com.assert_eq(com.mul(com.mul(xv, xv), xv), yv)
    return com


def test_groth16_cubic_roundtrip(g16):
    p = g16.fr.modulus
    x = RNG.randrange(p)
    y = pow(x, 3, p)
    pk = g16.compile(build_cubic(g16.context_compiler()).cs, RNG)
    prove_cs = build_cubic(g16.proof_compiler(), x, y).cs
    assert prove_cs.is_satisfied()
    proof = g16.prove(pk, prove_cs, RNG)
    assert g16.verify(pk.vk, [y], proof)
    # fuzzed public inputs must fail (reference constraint.rs:384-405)
    assert verify_fuzz_public_input(
        g16, pk.vk, [y], proof, lambda v: fuzz_vector(g16.fr, v, RNG), rounds=3
    )
    # wrong-length input rejected
    assert not g16.verify(pk.vk, [], proof)


def test_groth16_serialization_roundtrip(g16):
    p = g16.fr.modulus
    x = RNG.randrange(p)
    y = pow(x, 3, p)
    pk = g16.compile(build_cubic(g16.context_compiler()).cs, RNG)
    proof = g16.prove(pk, build_cubic(g16.proof_compiler(), x, y).cs, RNG)

    blob = proof.to_bytes(g16.pairing)
    proof2 = Proof.from_bytes(g16.pairing, blob)
    assert proof2.a == proof.a and proof2.b == proof.b and proof2.c == proof.c

    vk_blob = pk.vk.to_bytes()
    vk2 = VerifyingKey.from_bytes(g16.pairing, vk_blob)
    assert vk2.gamma_abc_g1 == pk.vk.gamma_abc_g1
    assert g16.verify(vk2, [y], proof2)


def test_groth16_poseidon_preimage():
    """The BASELINE.md headline circuit: prove knowledge of (a, b) with
    Poseidon(a, b) = h, h public."""
    g16 = Groth16(refpair.BLS12_381)
    params = PoseidonParams.generate(g16.fr, 3, 8, 55)

    def build(com, preimage=None, digest=None):
        h = com.public_input(digest)
        a = com.secret_witness(None if preimage is None else preimage[0])
        b = com.secret_witness(None if preimage is None else preimage[1])
        com.assert_eq(poseidon_gadget.hash(com, params, [a, b]), h)
        return com

    from openzl_tpu.eclair import NativeCompiler
    from openzl_tpu.ref import poseidon as refposeidon

    pre = [RNG.randrange(g16.fr.modulus) for _ in range(2)]
    digest = refposeidon.hash(params, pre)

    pk = g16.compile(build(g16.context_compiler()).cs, RNG)
    prove_cs = build(g16.proof_compiler(), pre, digest).cs
    assert prove_cs.is_satisfied()
    proof = g16.prove(pk, prove_cs, RNG)

    inputs = InputBuilder(g16.fr.modulus).extend_field(digest).build()
    assert g16.verify(pk.vk, inputs, proof)
    assert not g16.verify(pk.vk, [(digest + 1) % g16.fr.modulus], proof)


def test_groth16_proving_key_serialization_device_lift():
    """ProvingKey round-trips through bytes (ark member order), deserializes
    into host form, and `device_key` lifts it back into a kernel-prover key
    that produces a verifying proof — the serialized-prover-service flow."""
    from openzl_tpu.proof_systems.groth16 import ProvingKey

    g16 = Groth16(refpair.BN254, backend="device")
    p = g16.fr.modulus
    x = RNG.randrange(p)
    y = pow(x, 3, p)
    setup_cs = build_cubic(g16.context_compiler()).cs
    pk = g16.compile(setup_cs, random.Random(11))
    assert not pk.host

    blob = pk.to_bytes()
    pk2 = ProvingKey.from_bytes(g16.pairing, blob)
    assert pk2.host and pk2.domain_log2 == pk.domain_log2
    # byte-identity through a second round trip (host-form re-serialize)
    assert pk2.to_bytes() == blob

    pk_dev = g16.device_key(pk2, setup_cs)
    assert not pk_dev.host and pk_dev.prepared is not None
    prove_cs = build_cubic(g16.proof_compiler(), x, y).cs
    proof_a = g16.prove(pk, prove_cs, random.Random(7))
    proof_b = g16.prove(pk_dev, prove_cs, random.Random(7))
    assert proof_b.to_bytes(g16.pairing) == proof_a.to_bytes(g16.pairing)
    assert g16.verify(pk_dev.vk, [y], proof_b)


def test_groth16_device_backend_e2e():
    """The TPU prove pipeline end-to-end: device NTT + sparse matvec + MSMs
    (backend='device' forces every tiny-circuit heuristic off)."""
    g16 = Groth16(refpair.BN254, backend="device")
    params = PoseidonParams.generate(g16.fr, 3, 8, 55)

    def build(com, preimage=None, digest=None):
        h = com.public_input(digest)
        a = com.secret_witness(None if preimage is None else preimage[0])
        b = com.secret_witness(None if preimage is None else preimage[1])
        com.assert_eq(poseidon_gadget.hash(com, params, [a, b]), h)
        return com

    from openzl_tpu.ref import poseidon as refposeidon

    pre = [RNG.randrange(g16.fr.modulus) for _ in range(2)]
    digest = refposeidon.hash(params, pre)

    setup_cs = build(g16.context_compiler()).cs
    pk = g16.compile(setup_cs, RNG)
    assert pk.prepared is not None and not pk.host
    prove_cs = build(g16.proof_compiler(), pre, digest).cs
    proof = g16.prove(pk, prove_cs, RNG)

    inputs = InputBuilder(g16.fr.modulus).extend_field(digest).build()
    assert g16.verify(pk.vk, inputs, proof)
    assert not g16.verify(pk.vk, [(digest + 1) % g16.fr.modulus], proof)

    # tape-replay prove path (no Python re-trace): same pk, fresh proof
    calc = g16.witness_calculator(setup_cs)
    z = calc.evaluate([digest], pre)
    assert z == prove_cs.assignment()
    proof2 = g16.prove_assigned(pk, z, RNG)
    assert g16.verify(pk.vk, inputs, proof2)

    # limb-form fast path (no host bigints anywhere): bit-exact vs the
    # int-assignment prove under the same randomness
    import random as _r

    z_limbs = calc.evaluate_limbs([digest], pre)
    proof_a = g16.prove_assigned(pk, z, _r.Random(77))
    proof_b = g16.prove_assigned(pk, z_limbs, _r.Random(77))
    assert proof_b.to_bytes(g16.pairing) == proof_a.to_bytes(g16.pairing)

    # staged (HBM-capacity) prove: host-offloaded queries, per-stage MSMs
    # with explicit device-buffer frees — must stay bit-exact (this mode
    # is what fits the c=2^20 flagship prove on one chip). offload_queries
    # invalidates the original pk's device buffers, so it runs LAST.
    pk_staged = pk.offload_queries()
    assert pk_staged.staged
    proof_c = g16.prove_assigned(pk_staged, z_limbs, _r.Random(77))
    assert proof_c.to_bytes(g16.pairing) == proof_a.to_bytes(g16.pairing)
    # a second staged prove re-stages the freed COO/query buffers cleanly
    proof_d = g16.prove_assigned(pk_staged, z_limbs, _r.Random(78))
    assert g16.verify(pk_staged.vk, inputs, proof_d)
