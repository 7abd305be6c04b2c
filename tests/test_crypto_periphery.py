"""Periphery parity tests: duplex AEAD, hybrid encryption, key agreement,
Schnorr, ed25519, accumulator/forest/fork, password hashing, windowed tables.

Mirrors the reference's reusable test frameworks (SURVEY.md section 4:
encryption::test::correctness, signature::test, key::agreement::test,
algebra::test::window_correctness, accumulator::test)."""

import random

import numpy as np
import pytest

from openzl_tpu.crypto.algebra import CurveGroup, window_correctness
from openzl_tpu.crypto.accumulator import MerkleTreeAccumulator
from openzl_tpu.crypto.encryption import PoseidonAEAD
from openzl_tpu.crypto.encryption.hybrid import Hybrid
from openzl_tpu.crypto.key import DiffieHellman
from openzl_tpu.crypto.merkle.forest import MerkleForest
from openzl_tpu.crypto.merkle.fork import ForkedTree
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree
from openzl_tpu.crypto.password import PoseidonPasswordHasher
from openzl_tpu.crypto.poseidon.encryption import FixedDuplexer
from openzl_tpu.crypto.signature import Schnorr
from openzl_tpu.eclair import NativeCompiler, R1CSCompiler
from openzl_tpu.curves import BN254_G1
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.plugins import ed25519
from openzl_tpu.ref.poseidon import PoseidonParams

RNG = random.Random(0xBEEF)
SPEC = BN254_FR


def rand_elems(n):
    return [RNG.randrange(SPEC.modulus) for _ in range(n)]


@pytest.fixture(scope="module")
def pos_params():
    return PoseidonParams.generate(SPEC, width=3, full_rounds=8, partial_rounds=55)


# ---------------------------------------------------------------------------
# duplex AEAD (reference poseidon/test.rs:26-47 duplexer round trip)
# ---------------------------------------------------------------------------


def test_duplex_roundtrip(pos_params):
    com = NativeCompiler(SPEC)
    dup = FixedDuplexer(pos_params, n_blocks=3)
    key = rand_elems(3)
    header = rand_elems(2)
    plaintext = rand_elems(6)
    tag, ct = dup.encrypt(com, key, header, plaintext)
    assert ct != plaintext
    tag2, pt = dup.decrypt(com, key, header, ct)
    assert pt == plaintext
    assert tag == tag2
    # wrong key: tag mismatch
    _, ok = dup.decrypt_verified(com, rand_elems(3), header, ct, tag)
    assert not ok


def test_duplex_in_circuit(pos_params):
    """Encryption runs identically under the R1CS compiler (reference
    duplex works in-circuit, duplex.rs:208-303)."""
    native = NativeCompiler(SPEC)
    dup = FixedDuplexer(pos_params, n_blocks=1)
    key, header, pt = rand_elems(2), [], rand_elems(2)
    tag_n, ct_n = dup.encrypt(native, key, header, pt)

    com = R1CSCompiler.for_proofs(SPEC)
    key_v = [com.secret_witness(k) for k in key]
    pt_v = [com.secret_witness(x) for x in pt]
    tag_v, ct_v = dup.encrypt(com, key_v, [], pt_v)
    assert com.cs.is_satisfied()
    assert tag_v.value == tag_n
    assert [c.value for c in ct_v] == ct_n


# ---------------------------------------------------------------------------
# key agreement + hybrid encryption (reference hybrid.rs, agreement.rs tests)
# ---------------------------------------------------------------------------


def test_diffie_hellman_agreement():
    dh = DiffieHellman(CurveGroup(BN254_G1))
    a, b = dh.generate_secret(RNG), dh.generate_secret(RNG)
    assert dh.agree(a, dh.derive(b)) == dh.agree(b, dh.derive(a))


def test_hybrid_roundtrip():
    dh = DiffieHellman(CurveGroup(BN254_G1))
    scheme = Hybrid(dh, PoseidonAEAD(SPEC, n_blocks=2))
    sk = dh.generate_secret(RNG)
    rk = dh.derive(sk)
    eph = dh.generate_secret(RNG)
    pt = rand_elems(4)
    ct = scheme.encrypt(rk, eph, [], pt)
    assert scheme.decrypt(sk, ct) == pt
    assert scheme.decrypt(dh.generate_secret(RNG), ct) is None


# ---------------------------------------------------------------------------
# signatures
# ---------------------------------------------------------------------------


def test_schnorr_sign_verify():
    sch = Schnorr(CurveGroup(BN254_G1))
    sk = sch.generate_key(RNG)
    vk = sch.derive(sk)
    msg = rand_elems(3)
    sig = sch.sign(sk, sch.generate_key(RNG), msg)
    assert sch.verify(vk, msg, sig)
    assert not sch.verify(vk, rand_elems(3), sig)
    assert not sch.verify(sch.derive(sch.generate_key(RNG)), msg, sig)


def test_signature_converter_adapter():
    """Message-converting signature adapter (reference
    openzl-crypto/src/signature/convert.rs:26-80): structured messages are
    converted by `Forward::as_target` before sign/verify; keys and
    signatures pass through the base scheme unchanged."""
    from openzl_tpu.crypto.signature.convert import Converter

    base = Schnorr(CurveGroup(BN254_G1))
    p = BN254_FR.modulus

    def forward(msg_dict):  # structured message -> field-element list
        return [msg_dict["a"] % p, msg_dict["b"] % p, msg_dict["nonce"] % p]

    sch = Converter(base, forward)
    assert sch.into_inner() is base
    sk = sch.generate_key(RNG)
    vk = sch.derive(sk)
    msg = {"a": 7, "b": 11, "nonce": 13}
    sig = sch.sign(sk, sch.generate_key(RNG), msg)
    assert sch.verify(vk, msg, sig)
    assert not sch.verify(vk, {"a": 7, "b": 11, "nonce": 14}, sig)
    # the adapter signs exactly what the base scheme would over the target
    assert base.verify(vk, forward(msg), sig)


def test_ed25519_rfc8032_vector():
    """RFC 8032 test vector 1 (empty message)."""
    seed = bytes.fromhex(
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60"
    )
    kp = ed25519.keypair_from_seed(seed)
    assert kp.public.hex() == (
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a"
    )
    sig = ed25519.sign(kp, b"")
    assert sig.hex() == (
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"
    )
    assert ed25519.verify(kp.public, b"", sig)
    assert not ed25519.verify(kp.public, b"x", sig)


# ---------------------------------------------------------------------------
# accumulator / forest / fork
# ---------------------------------------------------------------------------


def test_accumulator_provable_membership():
    params = MerkleParameters(SPEC, height=5)
    acc = MerkleTreeAccumulator(params)
    items = rand_elems(6)
    assert acc.extend(items)
    for item in items:
        proof = acc.prove(item)
        assert proof is not None
        assert acc.verify(item, proof)
    assert acc.prove(items[0] + 1) is None
    # old proofs verify against their snapshot root even after more inserts
    proof0 = acc.prove(items[0])
    acc.insert(rand_elems(1)[0])
    assert acc.verify(items[0], proof0)


def test_forest_shards_and_proves():
    params = MerkleParameters(SPEC, height=5)
    forest = MerkleForest(params, n_trees=4)
    items = rand_elems(12)
    assert forest.extend(items)
    assert len(forest) == 12
    for item in items:
        pr = forest.prove(item)
        assert pr is not None and forest.verify(item, pr)
    assert forest.roots().shape == (SPEC.n_limbs, 4)


def test_fork_rollback_commit():
    params = MerkleParameters(SPEC, height=5)
    base = MerkleTree.from_leaf_digests(
        params, limb.pack_mont(SPEC, np.array(rand_elems(4), dtype=object))
    )
    forked = ForkedTree(base)
    root0 = np.asarray(forked.root()).copy()
    forked.push(limb.pack_mont(SPEC, rand_elems(1)[0]))
    assert not np.array_equal(np.asarray(forked.root()), root0)
    forked.rollback()
    assert np.array_equal(np.asarray(forked.root()), root0)
    forked.push(limb.pack_mont(SPEC, rand_elems(1)[0]))
    forked.commit()
    assert np.array_equal(
        np.asarray(forked.base.root()), np.asarray(forked.fork.root())
    )


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def test_window_table_correctness():
    assert window_correctness(CurveGroup(BN254_G1), RNG)


def test_password_hash():
    hasher = PoseidonPasswordHasher(SPEC, iterations=4)
    d = hasher.hash(b"hunter2", b"salt")
    assert hasher.verify(b"hunter2", b"salt", d)
    assert not hasher.verify(b"hunter3", b"salt", d)
    assert not hasher.verify(b"hunter2", b"pepper", d)


def test_converted_scheme_roundtrip():
    """Converter adapters (reference encryption/convert/*): encrypt a
    structured value through a field-element scheme via plaintext
    converters; key conversion derives the field key from bytes."""
    from openzl_tpu.crypto.encryption.convert import ConvertedScheme

    base = PoseidonAEAD(SPEC, n_blocks=1)

    def encode(s: bytes):
        # two field elements per block (message_len == 2)
        return [int.from_bytes(s[:16], "little"), int.from_bytes(s[16:32], "little")]

    def decode(fields):
        return bytes(
            b
            for x, n in zip(fields, (16, 16))
            for b in int(x).to_bytes(n, "little")
        ).rstrip(b"\0")

    scheme = ConvertedScheme(
        base,
        forward_plaintext=encode,
        reverse_plaintext=decode,
        forward_key=lambda kb: [int.from_bytes(kb, "little") % SPEC.modulus],
    )
    key = b"\x07" * 24
    msg = b"hello converted world"
    ct = scheme.encrypt(key, [], msg)
    assert scheme.decrypt(key, ct) == msg
    assert scheme.decrypt(b"\x08" * 24, ct) is None


# ---------------------------------------------------------------------------
# message container algebra (reference encryption/mod.rs:246-760: Message,
# EncryptedMessage methods, UnsafeOutput/UnsafeNoEncrypt, test::correctness)
# ---------------------------------------------------------------------------


def test_message_container_algebra():
    from openzl_tpu.crypto.encryption import (
        EncryptedMessage,
        Message,
        correctness,
    )
    from openzl_tpu.utils.codec import Reader, Writer

    cipher = PoseidonAEAD(SPEC, n_blocks=2)
    key = rand_elems(2)
    header = tuple(rand_elems(2))
    pt = tuple(rand_elems(4))

    # Message::encrypt -> EncryptedMessage::decrypt round trip
    msg = Message(plaintext=pt, header=header)
    enc = msg.encrypt(cipher, key)
    assert isinstance(enc, EncryptedMessage)
    assert enc.decrypt(cipher, key) == list(pt)
    assert enc.decrypt(cipher, rand_elems(2)) is None

    # into(): header/ciphertext conversion preserves the tag
    shifted = enc.into(convert_ciphertext=lambda c: [x for x in c])
    assert shifted.tag == enc.tag and shifted.ciphertext == enc.ciphertext

    # Input impl: header + ciphertext + tag into the public-input builder
    from openzl_tpu.crypto.constraint import InputBuilder

    built = enc.extend_input(InputBuilder(SPEC.modulus)).build()
    assert built == list(header) + list(enc.ciphertext) + [enc.tag]

    # Encode impl: codec round trip
    w = Writer()
    enc.encode(w, SPEC)
    r = Reader(w.getvalue())
    assert [r.field(SPEC) for _ in range(len(header))] == list(header)
    assert [r.field(SPEC) for _ in range(len(enc.ciphertext))] == list(
        enc.ciphertext
    )
    assert r.field(SPEC) == enc.tag

    # reusable correctness helper (deterministic + randomized schemes)
    correctness(cipher, key, key, header, pt)
    dh = DiffieHellman(CurveGroup(BN254_G1))
    hybrid = Hybrid(dh, PoseidonAEAD(SPEC, n_blocks=2))
    sk = dh.generate_secret(RNG)
    correctness(
        hybrid, dh.derive(sk), sk, (), pt,
        randomness=dh.generate_secret(RNG),
        assert_same=lambda got, want: got == list(want),
    )


def test_encrypted_message_equality_in_circuit():
    """EncryptedMessage eq/assert_equal run under any compiler
    (mod.rs:635-658); the R1CS form must be satisfiable for equal
    messages and the native eq must detect inequality."""
    from openzl_tpu.crypto.encryption import EncryptedMessage

    vals = rand_elems(3)

    def lift(com):
        return EncryptedMessage(
            tag=com.secret_witness(vals[0]),
            ciphertext=(com.secret_witness(vals[1]),),
            header=(com.secret_witness(vals[2]),),
        )

    com = R1CSCompiler.for_proofs(SPEC)
    a, b = lift(com), lift(com)
    a.assert_equal(b, com)
    assert com.cs.is_satisfied()

    ncom = NativeCompiler(SPEC)
    na = EncryptedMessage(tag=vals[0], ciphertext=(vals[1],), header=(vals[2],))
    nb = EncryptedMessage(
        tag=vals[0], ciphertext=((vals[1] + 1) % SPEC.modulus,), header=(vals[2],)
    )
    assert na.eq(na, ncom)
    assert not na.eq(nb, ncom)


def test_unsafe_no_encrypt():
    """UnsafeNoEncrypt returns the phantom UnsafeOutput: compares equal,
    encodes to nothing, extends no input (mod.rs:320-487)."""
    from openzl_tpu.crypto.encryption import UnsafeNoEncrypt, UnsafeOutput
    from openzl_tpu.crypto.constraint import InputBuilder
    from openzl_tpu.utils.codec import Writer

    scheme = UnsafeNoEncrypt(PoseidonAEAD(SPEC, n_blocks=1))
    out = scheme.encrypt(rand_elems(2), (), rand_elems(2))
    assert isinstance(out, UnsafeOutput)
    assert out == UnsafeOutput()
    ncom = NativeCompiler(SPEC)
    assert out.eq(UnsafeOutput(), ncom)
    out.assert_equal(UnsafeOutput(), ncom)
    w = Writer()
    out.encode(w, SPEC)
    assert w.getvalue() == b""
    assert out.extend_input(InputBuilder(SPEC.modulus)).build() == []
