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
