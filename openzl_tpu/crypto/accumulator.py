"""Dynamic accumulator abstraction (reference openzl-crypto/src/accumulator.rs).

`Accumulator` protocol: insert / prove / verify / contains, with
`MembershipProof` carrying (witness, output-root) exactly like the reference
(accumulator.rs:219-308). `MerkleTreeAccumulator` implements it over the
array-resident Merkle tree (the reference's `MerkleTree` impl,
merkle_tree/tree.rs:1046-1085); the in-circuit `assert_valid` path is the
Merkle gadget (crypto/merkle/gadget.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..fields import limb
from .merkle.path import MerklePath
from .merkle.tree import MerkleParameters, MerkleTree


@dataclasses.dataclass(frozen=True)
class MembershipProof:
    """(witness = path, output = root snapshot); reference accumulator.rs:219."""

    witness: MerklePath
    output: np.ndarray  # root digest (n_limbs,), Montgomery form


class MerkleTreeAccumulator:
    """Mutable accumulator facade over immutable tree values.

    Items are canonical field ints (leaf digests are the identity hash of
    field-element leaves, reference tree.rs:68-90).
    """

    def __init__(self, parameters: MerkleParameters):
        self.parameters = parameters
        self.tree = MerkleTree.empty(parameters)
        self._index = {}

    def __len__(self) -> int:
        return len(self.tree)

    def _digest(self, item: int) -> np.ndarray:
        return limb.pack_mont(self.parameters.spec, item % self.parameters.spec.modulus)

    def insert(self, item: int) -> bool:
        if len(self.tree) >= self.parameters.capacity:
            return False
        digest = self._digest(item)
        self._index.setdefault(item % self.parameters.spec.modulus, len(self.tree))
        self.tree = self.tree.push(digest)
        return True

    def extend(self, items) -> bool:
        for item in items:
            if not self.insert(item):
                return False
        return True

    def root(self) -> np.ndarray:
        return self.tree.root()

    def position(self, item: int) -> Optional[int]:
        return self._index.get(item % self.parameters.spec.modulus)

    def contains(self, item: int) -> bool:
        return self.position(item) is not None

    def prove(self, item: int) -> Optional[MembershipProof]:
        pos = self.position(item)
        if pos is None:
            return None
        return MembershipProof(self.tree.path(pos), self.tree.root())

    def verify(self, item: int, proof: MembershipProof) -> bool:
        return proof.witness.verify(proof.output, self._digest(item))


class OptimizedMerkleAccumulator(MerkleTreeAccumulator):
    """Accumulator with storage-optimized inserts over the partial tree.

    Reference parity: `OptimizedAccumulator::insert_nonprovable` +
    `remove_path` (accumulator.rs:96-123,153-206) — items inserted
    non-provably never hold proof storage, and `remove_path` releases an
    item's storage once every older item is also released (the partial tree
    trims contiguous prefixes; reference `Partial` behaves the same by
    dropping the non-provable prefix).
    """

    def __init__(self, parameters: MerkleParameters):
        from .merkle.partial import PartialMerkleTree

        self.parameters = parameters
        self.tree = PartialMerkleTree.empty(parameters)
        self._index = {}
        self._removed = set()

    def insert(self, item: int) -> bool:
        if len(self.tree) >= self.parameters.capacity:
            return False
        key = item % self.parameters.spec.modulus
        self._index.setdefault(key, len(self.tree))
        self.tree = self.tree.push(self._digest(item))
        return True

    def insert_nonprovable(self, item: int) -> bool:
        """Insert without retaining proof capability (accumulator.rs:99-113:
        default falls back to `insert`; optimized impls drop the data)."""
        if not self.insert(item):
            return False
        self._removed.add(len(self.tree) - 1)
        self._trim_contiguous()
        return True

    def remove_path(self, item: int) -> bool:
        """Drop the proof storage for `item` (accumulator.rs:131-151).

        Returns True when the storage is (now) droppable — storage is
        physically reclaimed once the removed set forms a contiguous prefix.
        """
        pos = self.position(item)
        if pos is None or pos < self.tree.starting_leaf_index:
            return False
        self._removed.add(pos)
        self._trim_contiguous()
        return True

    def _trim_contiguous(self) -> None:
        start = self.tree.starting_leaf_index
        while start < len(self.tree) and start in self._removed:
            self._removed.discard(start)
            start += 1
        if start != self.tree.starting_leaf_index:
            self.tree = self.tree.trim(start)

    def prove(self, item: int) -> Optional[MembershipProof]:
        pos = self.position(item)
        if pos is None or pos < self.tree.starting_leaf_index:
            return None
        return MembershipProof(self.tree.path(pos), self.tree.root())


# ---------------------------------------------------------------------------
# reusable test framework (reference accumulator.rs:313-365, exported for
# downstream users behind `feature = "test"`)
# ---------------------------------------------------------------------------


def assert_provable_membership(accumulator, items) -> np.ndarray:
    """Insert `items`, then prove+verify membership of each against the
    final output; returns that output (accumulator.rs:313-341)."""
    for item in items:
        assert accumulator.insert(item), "insertion failed"
    root = accumulator.root()
    for item in items:
        proof = accumulator.prove(item)
        assert proof is not None, "missing membership proof"
        assert accumulator.verify(item, proof), "membership proof rejected"
    return root


def assert_unique_outputs(acc_a, items_a, acc_b, items_b) -> None:
    """Accumulators over different item sets must produce different outputs
    (accumulator.rs:343-365)."""
    out_a = assert_provable_membership(acc_a, items_a)
    out_b = assert_provable_membership(acc_b, items_b)
    if list(items_a) != list(items_b):
        assert not np.array_equal(np.asarray(out_a), np.asarray(out_b))
