"""Serialization round trips (field elements, G1/G2 points, checkpoints)."""

import os
import random
import tempfile

import numpy as np
import pytest

from openzl_tpu.curves import BLS12_381_G1, BLS12_381_G2, BN254_G1
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FR
from openzl_tpu.ref import curve as refc
from openzl_tpu.utils import checkpoint, codec

RNG = random.Random(0xC0DEC)


def test_field_roundtrip():
    for spec in (BN254_FR, BLS12_381_FQ):
        for x in [0, 1, spec.modulus - 1, RNG.randrange(spec.modulus)]:
            blob = codec.field_to_bytes(spec, x)
            assert len(blob) == spec.n_bytes
            assert codec.field_from_bytes(spec, blob) == x


def test_point_roundtrip_g1():
    for curve in (BN254_G1, BLS12_381_G1):
        pts = [None, refc.generator(curve)] + [
            refc.random_point(curve, RNG) for _ in range(4)
        ]
        for pt in pts:
            blob = codec.point_to_bytes(curve, pt)
            assert len(blob) == curve.base.n_bytes
            assert codec.point_from_bytes(curve, blob) == pt


def test_point_roundtrip_g2():
    curve = BLS12_381_G2
    pts = [None, refc.generator(curve)] + [
        refc.random_point(curve, RNG) for _ in range(3)
    ]
    for pt in pts:
        blob = codec.point_to_bytes(curve, pt)
        assert len(blob) == curve.base.n_bytes * 2
        assert codec.point_from_bytes(curve, blob) == pt


def test_point_roundtrip_g2_bls377_nonresidue():
    """BLS12-377's Fq2 is Fq[u]/(u^2 + 5), not u^2 + 1: decompression must
    use the curve's nr2 (regression — the f2 sqrt once hard-coded beta=-1,
    so every 377-G2 decompress either failed or returned an off-curve y)."""
    from openzl_tpu.curves import BLS12_377_G2

    curve = BLS12_377_G2
    pts = [None, refc.generator(curve)] + [
        refc.random_point(curve, RNG) for _ in range(3)
    ]
    for pt in pts:
        blob = codec.point_to_bytes(curve, pt)
        assert codec.point_from_bytes(curve, blob) == pt


def test_point_roundtrip_uncompressed():
    """Uncompressed (x, y) encoding: double width, on-curve check kept."""
    from openzl_tpu.curves import BLS12_377_G2

    for curve in (BN254_G1, BLS12_381_G1, BLS12_381_G2, BLS12_377_G2):
        pts = [None, refc.generator(curve)] + [
            refc.random_point(curve, RNG) for _ in range(2)
        ]
        for pt in pts:
            blob = codec.point_to_bytes(curve, pt, compressed=False)
            assert len(blob) == codec.point_size(curve, compressed=False)
            got = codec.point_from_bytes(curve, blob, compressed=False)
            assert got == pt
    # corrupting y must fail the curve-equation check (not round-trip)
    curve = BLS12_381_G1
    blob = bytearray(
        codec.point_to_bytes(curve, refc.generator(curve), compressed=False)
    )
    blob[curve.base.n_bytes + 3] ^= 1
    with pytest.raises(codec.DecodeError):
        codec.point_from_bytes(curve, bytes(blob), compressed=False)


def test_merkle_checkpoint_roundtrip():
    spec = BN254_FR
    params = MerkleParameters(spec, height=5)
    leaves = [RNG.randrange(spec.modulus) for _ in range(6)]
    tree = MerkleTree.from_leaf_digests(
        params, limb.pack_mont(spec, np.array(leaves, dtype=object))
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tree.npz")
        checkpoint.save_merkle_tree(path, tree)
        back = checkpoint.load_merkle_tree(path)
    assert back.count == tree.count
    assert np.array_equal(back.root(), tree.root())
    # resumed tree keeps accepting pushes with identical roots
    nxt = limb.pack_mont(spec, RNG.randrange(spec.modulus))
    assert np.array_equal(
        np.asarray(tree.push(nxt).root()), np.asarray(back.push(nxt).root())
    )


# ---------------------------------------------------------------------------
# decode errors (reference codec returns Results: openzl-util/src/codec.rs)
# ---------------------------------------------------------------------------


def test_decode_errors_are_typed():
    from openzl_tpu.utils.codec import DecodeError, Reader, field_from_bytes

    with pytest.raises(DecodeError):
        field_from_bytes(BN254_FR, b"\xff" * BN254_FR.n_bytes)  # >= modulus
    with pytest.raises(DecodeError):
        field_from_bytes(BN254_FR, b"\x01" * 7)  # wrong length
    with pytest.raises(DecodeError):
        Reader(b"123").u64()  # truncated input
    # off-curve x must raise: each lsb perturbation has ~50% odds of
    # leaving the curve, so one of a handful must fail
    from openzl_tpu.utils.codec import point_from_bytes, point_to_bytes

    good = point_to_bytes(BLS12_381_G1, refc.generator(BLS12_381_G1))
    saw_reject = False
    for delta in range(1, 9):
        bad = bytearray(good)
        bad[0] ^= delta
        try:
            point_from_bytes(BLS12_381_G1, bytes(bad))
        except DecodeError:
            saw_reject = True
            break
    assert saw_reject, "no off-curve x rejected"


def test_non_subgroup_point_rejected():
    """On-curve points OUTSIDE the prime-order subgroup must be rejected by
    default (ark Validate::Yes semantics; ADVICE r4 medium finding — the
    curve-equation check alone admits cofactor components into pairings).
    A random x on BLS12-381 (cofactor ~ 2^125) is in the r-subgroup with
    negligible probability."""
    curve = BLS12_381_G1
    p = curve.base.modulus
    x = 7
    while True:
        y2 = (x * x * x + curve.b) % p
        y = codec._sqrt_mod(curve.base, y2)
        if y is not None:
            break
        x += 1
    pt = (x, y)
    assert refc.is_on_curve(curve, pt)
    assert not codec.subgroup_check(curve, pt)
    blob = codec.point_to_bytes(curve, pt)
    with pytest.raises(codec.DecodeError):
        codec.point_from_bytes(curve, blob)
    # unchecked decode (ark deserialize_unchecked analogue) still works
    assert codec.point_from_bytes(curve, blob, validate=False) == pt
    # clearing the cofactor lands in the subgroup and decodes cleanly
    cleared = _raw_mul(curve, curve.cofactor, pt)
    blob2 = codec.point_to_bytes(curve, cleared)
    assert codec.point_from_bytes(curve, blob2) == cleared
    # cofactor-1 curves (BN254 G1): every on-curve point passes
    assert codec.subgroup_check(BN254_G1, refc.generator(BN254_G1))


def _raw_mul(curve, k, pt):
    """Double-and-add WITHOUT the mod-r reduction of refc.scalar_mul."""
    acc, base = None, pt
    while k:
        if k & 1:
            acc = refc.add(curve, acc, base)
        k >>= 1
        if k:
            base = refc.add(curve, base, base)
    return acc


# ---------------------------------------------------------------------------
# external interop fixture: the standard zcash-format BLS12-381 G1 generator
# ---------------------------------------------------------------------------


def test_bls12_381_generator_matches_public_encoding():
    """Cross-implementation anchor: the universally published zcash-format
    compressed encoding of the BLS12-381 G1 generator. Decoding it (big-
    endian x, flag bits 0xE0 in the first byte) must yield exactly our
    generator's coordinates — validating curve constants and y-recovery
    against an external artifact (BASELINE.md config 5 interop intent)."""
    from openzl_tpu.curves.spec import BLS12_381_G1
    from openzl_tpu.ref import curve as refc
    from openzl_tpu.utils.codec import _sqrt_mod

    zcash_hex = (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905"
        "a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
    )
    raw = bytearray.fromhex(zcash_hex)
    assert raw[0] & 0x80, "compressed flag"
    assert not raw[0] & 0x40, "not infinity"
    y_is_lexicographically_largest = bool(raw[0] & 0x20)
    raw[0] &= 0x1F
    spec = BLS12_381_G1.base
    x = int.from_bytes(bytes(raw), "big")
    gx, gy = refc.generator(BLS12_381_G1)
    assert x == gx, "generator x mismatch vs public encoding"
    y2 = (x * x * x + BLS12_381_G1.b) % spec.modulus
    y = _sqrt_mod(spec, y2)
    assert y is not None
    if (y > spec.modulus - y) != y_is_lexicographically_largest:
        y = spec.modulus - y
    assert y == gy, "generator y mismatch vs public encoding"


def test_io_reader_writer_streams():
    """IoWriter/IoReader run the codec surface over arbitrary binary
    streams (reference codec.rs:322-439 IoReader/IoWriter)."""
    import io

    from openzl_tpu.utils.codec import IoReader, IoWriter

    spec = BLS12_381_FR
    stream = io.BytesIO()
    w = IoWriter(stream)
    w.u64(7)
    w.field(spec, 12345)
    w.vec([1, 2, 3], lambda x: w.field(spec, x))
    with pytest.raises(TypeError):
        w.getvalue()  # streamed output lives in the target

    stream.seek(0)
    r = IoReader(stream)
    assert r.u64() == 7
    assert r.field(spec) == 12345
    assert r.vec(lambda: r.field(spec)) == [1, 2, 3]


def test_pipeline_chaining():
    """Pipeline chains encode/decode steps fluently over one codec object
    (reference codec.rs:465-546)."""
    from openzl_tpu.utils.codec import Pipeline, Reader, Writer

    spec = BLS12_381_FR
    w = Writer()
    Pipeline(w).write(lambda w: w.u64(2)).write(lambda w: w.field(spec, 99))
    r = Reader(w.getvalue())
    got = Pipeline(r).read(lambda r: r.u64()).read(lambda r: r.field(spec)).finish()
    assert got == (2, 99)
