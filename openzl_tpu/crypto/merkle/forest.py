"""Merkle forest: leaves sharded across independent trees by index
(reference openzl-crypto/src/merkle_tree/forest.rs:30-530).

The forest is the reference's natural data-parallel axis (SURVEY.md section
2.9): each tree is independent, so bulk inserts batch per-tree and the whole
forest maps onto a device mesh by sharding the tree axis.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..accumulator import MembershipProof, MerkleTreeAccumulator
from .tree import MerkleParameters


def fixed_index(n_trees: int, item: int) -> int:
    """`FixedIndex` configuration: shard by the low bits of the item
    (reference forest.rs:52-60 uses the leading byte; any fixed map works
    as long as insert/query agree)."""
    return item % n_trees


@dataclasses.dataclass
class MerkleForest:
    """N independent accumulators with a fixed leaf->tree map."""

    parameters: MerkleParameters
    n_trees: int

    def __post_init__(self):
        self.trees: List[MerkleTreeAccumulator] = [
            MerkleTreeAccumulator(self.parameters) for _ in range(self.n_trees)
        ]

    def tree_index(self, item: int) -> int:
        return fixed_index(self.n_trees, item)

    def __len__(self) -> int:
        return sum(len(t) for t in self.trees)

    def insert(self, item: int) -> bool:
        return self.trees[self.tree_index(item)].insert(item)

    def extend(self, items) -> bool:
        return all(self.insert(x) for x in items)

    def contains(self, item: int) -> bool:
        return self.trees[self.tree_index(item)].contains(item)

    def prove(self, item: int) -> Optional[Tuple[int, MembershipProof]]:
        idx = self.tree_index(item)
        proof = self.trees[idx].prove(item)
        return None if proof is None else (idx, proof)

    def verify(self, item: int, indexed_proof: Tuple[int, MembershipProof]) -> bool:
        idx, proof = indexed_proof
        if idx != self.tree_index(item):
            return False
        return self.trees[idx].verify(item, proof)

    def roots(self) -> np.ndarray:
        return np.stack([t.root() for t in self.trees], axis=1)
