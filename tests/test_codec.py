"""Serialization round trips (field elements, G1/G2 points, checkpoints)."""

import os
import random
import tempfile

import numpy as np

from openzl_tpu.curves import BLS12_381_G1, BLS12_381_G2, BN254_G1
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FQ, BN254_FR
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
