"""Merkle storage variants vs the dense tree: single-path, partial,
CurrentPath update-on-push (reference merkle_tree/{single_path,partial,
path}.rs). The dense tree is the semantics oracle: every variant must
reproduce its roots bit-for-bit."""

import numpy as np
import pytest

from openzl_tpu.crypto.merkle.partial import PartialMerkleTree
from openzl_tpu.crypto.merkle.path import CurrentPath
from openzl_tpu.crypto.merkle.single_path import SinglePathMerkleTree
from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree
from openzl_tpu.fields.spec import BN254_FR

PARAMS = MerkleParameters(BN254_FR, height=5)  # capacity 16


def leaves(k, seed=0):
    rng = np.random.default_rng(seed)
    out = rng.integers(
        0, 1 << 16, size=(BN254_FR.n_limbs, k), dtype=np.uint32
    )
    out[-1] &= 0x3FFF
    return out


class TestCurrentPath:
    def test_roots_track_dense_tree(self):
        ls = leaves(9)
        cur = CurrentPath.empty(PARAMS)
        dense = MerkleTree.empty(PARAMS)
        for i in range(ls.shape[1]):
            cur = cur.push(ls[:, i])
            dense = dense.push(ls[:, i])
            assert (cur.root_digest == dense.root()).all(), f"root @ {i}"

    def test_current_path_verifies(self):
        ls = leaves(6, seed=1)
        cur = CurrentPath.empty(PARAMS)
        for i in range(ls.shape[1]):
            cur = cur.push(ls[:, i])
            path = cur.current_path()
            assert path.leaf_index == i
            assert path.verify(cur.root_digest, ls[:, i])

    def test_capacity_enforced(self):
        small = MerkleParameters(BN254_FR, height=2)  # capacity 2
        cur = CurrentPath.empty(small)
        cur = cur.push(leaves(1)[:, 0]).push(leaves(1, 1)[:, 0])
        with pytest.raises(AssertionError):
            cur.push(leaves(1, 2)[:, 0])


class TestSinglePath:
    def test_matches_dense_and_verifies(self):
        ls = leaves(7, seed=2)
        sp = SinglePathMerkleTree.empty(PARAMS)
        dense = MerkleTree.empty(PARAMS)
        for i in range(ls.shape[1]):
            sp = sp.push(ls[:, i])
            dense = dense.push(ls[:, i])
            assert (sp.root() == dense.root()).all()
            assert sp.verify_current()
        assert len(sp) == 7

    def test_memory_is_o_height(self):
        sp = SinglePathMerkleTree.empty(PARAMS)
        for i in range(10):
            sp = sp.push(leaves(1, i)[:, 0])
        assert len(sp.current.frontier) == PARAMS.height - 1


class TestPartial:
    def test_bulk_build_matches_dense(self):
        ls = leaves(11, seed=3)
        partial = PartialMerkleTree.from_leaf_digests(PARAMS, ls)
        dense = MerkleTree.from_leaf_digests(PARAMS, ls)
        assert (partial.root() == dense.root()).all()

    def test_incremental_and_paths_match_dense(self):
        ls = leaves(9, seed=4)
        partial = PartialMerkleTree.empty(PARAMS)
        dense = MerkleTree.empty(PARAMS)
        for i in range(ls.shape[1]):
            partial = partial.push(ls[:, i])
            dense = dense.push(ls[:, i])
            assert (partial.root() == dense.root()).all()
        for i in range(ls.shape[1]):
            p = partial.path(i)
            d = dense.path(i)
            assert (p.sibling_digest == d.sibling_digest).all()
            assert (p.inner_path == d.inner_path).all()
            assert p.verify(partial.root(), ls[:, i])

    def test_trim_preserves_root_and_suffix_proofs(self):
        ls = leaves(10, seed=5)
        partial = PartialMerkleTree.from_leaf_digests(PARAMS, ls)
        root = partial.root()
        trimmed = partial.trim(6)
        assert (trimmed.root() == root).all()
        # suffix proofs still work
        for i in range(6, 10):
            assert trimmed.path(i).verify(root, ls[:, i])
        # trimmed leaves are gone
        with pytest.raises(AssertionError):
            trimmed.path(2)
        # storage actually shrank
        assert trimmed.levels[0].shape[1] < partial.levels[0].shape[1]

    def test_push_after_trim_matches_dense(self):
        ls = leaves(12, seed=6)
        partial = PartialMerkleTree.from_leaf_digests(PARAMS, ls[:, :8]).trim(5)
        dense = MerkleTree.from_leaf_digests(PARAMS, ls[:, :8])
        for i in range(8, 12):
            partial = partial.push(ls[:, i])
            dense = dense.push(ls[:, i])
            assert (partial.root() == dense.root()).all(), f"root @ {i}"
        assert partial.path(9).verify(partial.root(), ls[:, 9])


class TestDenseIncrementalBuckets:
    def test_many_pushes_still_correct(self):
        # pow2-bucketed dirty widths (the recompile-storm fix) must not
        # change results: every intermediate root matches a fresh bulk build
        ls = leaves(13, seed=7)
        tree = MerkleTree.empty(PARAMS)
        for i in range(ls.shape[1]):
            tree = tree.push(ls[:, i])
            bulk = MerkleTree.from_leaf_digests(PARAMS, ls[:, : i + 1])
            assert (tree.root() == bulk.root()).all()
