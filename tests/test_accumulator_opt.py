"""Optimized accumulator (insert_nonprovable / remove_path) + the reusable
accumulator/merkle test frameworks (reference accumulator.rs:96-206,313-365
and merkle_tree/test.rs:91-265)."""

import numpy as np
import pytest

from openzl_tpu.crypto.accumulator import (
    MerkleTreeAccumulator,
    OptimizedMerkleAccumulator,
    assert_provable_membership,
    assert_unique_outputs,
)
from openzl_tpu.crypto.merkle import testkit
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BN254_FR

PARAMS = MerkleParameters(BN254_FR, height=5)


class TestOptimizedAccumulator:
    def test_matches_plain_accumulator_roots(self):
        plain = MerkleTreeAccumulator(PARAMS)
        opt = OptimizedMerkleAccumulator(PARAMS)
        items = [101, 202, 303, 404, 505]
        for x in items:
            assert plain.insert(x) and opt.insert(x)
        assert np.array_equal(plain.root(), opt.root())

    def test_insert_nonprovable_drops_storage_keeps_root(self):
        plain = MerkleTreeAccumulator(PARAMS)
        opt = OptimizedMerkleAccumulator(PARAMS)
        for x in (1, 2, 3):
            plain.insert(x)
            assert opt.insert_nonprovable(x)
        for x in (4, 5):
            plain.insert(x)
            opt.insert(x)
        assert np.array_equal(plain.root(), opt.root())
        assert opt.prove(2) is None  # nonprovable item has no proof
        proof = opt.prove(4)
        assert proof is not None and opt.verify(4, proof)
        assert opt.tree.starting_leaf_index == 3  # storage reclaimed

    def test_remove_path_contiguous_reclaim(self):
        opt = OptimizedMerkleAccumulator(PARAMS)
        for x in (10, 20, 30, 40):
            opt.insert(x)
        # removing out of order: storage reclaimed once prefix is contiguous
        assert opt.remove_path(20)
        assert opt.tree.starting_leaf_index == 0  # 10 still provable
        assert opt.remove_path(10)
        assert opt.tree.starting_leaf_index == 2  # both reclaimed now
        assert opt.prove(10) is None and opt.prove(20) is None
        assert opt.prove(30) is not None

    def test_framework_helpers(self):
        assert_provable_membership(
            MerkleTreeAccumulator(PARAMS), [7, 8, 9]
        )
        assert_unique_outputs(
            MerkleTreeAccumulator(PARAMS), [1, 2],
            MerkleTreeAccumulator(PARAMS), [2, 1],
        )


class TestMerkleTestKit:
    def test_mock_tree_structure(self):
        params = testkit.mock_parameters(BN254_FR, 5)
        rng = np.random.default_rng(0)

        def leaf():
            out = rng.integers(
                0, 1 << 16, size=(BN254_FR.n_limbs,), dtype=np.uint32
            )
            out[-1] &= 0x3FFF
            return out

        tree = testkit.push_twice_to_empty_tree_succeeds(params, leaf(), leaf())
        for _ in range(5):
            tree = tree.push(leaf())
        testkit.assert_valid_paths(tree)

    def test_mock_matches_bulk_build(self):
        params = testkit.mock_parameters(BN254_FR, 4)
        rng = np.random.default_rng(1)
        ls = rng.integers(
            0, 1 << 14, size=(BN254_FR.n_limbs, 6), dtype=np.uint32
        )
        inc = MerkleTree.empty(params)
        for i in range(6):
            inc = inc.push(ls[:, i])
        bulk = MerkleTree.from_leaf_digests(params, ls)
        assert np.array_equal(inc.root(), bulk.root())
