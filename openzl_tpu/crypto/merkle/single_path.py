"""Single-path Merkle tree: O(height) storage, proofs only for the newest
leaf (reference openzl-crypto/src/merkle_tree/single_path.rs:28-212).

Holds just the latest leaf digest, the compressed current path
(path.CurrentPath) and the root. Roots match the dense `MerkleTree`
bit-for-bit (tests/test_merkle_variants.py), so accumulators can migrate
between storage variants freely.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .path import CurrentPath, MerklePath
from .tree import MerkleParameters


@dataclasses.dataclass(frozen=True)
class SinglePathMerkleTree:
    parameters: MerkleParameters
    leaf_digest: Optional[np.ndarray]  # newest leaf, None when empty
    current: CurrentPath

    @classmethod
    def empty(cls, parameters: MerkleParameters) -> "SinglePathMerkleTree":
        return cls(parameters, None, CurrentPath.empty(parameters))

    def __len__(self) -> int:
        return self.current.count

    def root(self) -> np.ndarray:
        return self.current.root_digest

    def push(self, leaf_digest: np.ndarray) -> "SinglePathMerkleTree":
        leaf_digest = np.asarray(leaf_digest)
        return SinglePathMerkleTree(
            self.parameters, leaf_digest, self.current.push(leaf_digest)
        )

    def current_path(self) -> MerklePath:
        """Membership path for the newest leaf (the only provable one —
        single_path.rs stores no historic data)."""
        return self.current.current_path()

    def verify_current(self) -> bool:
        assert self.leaf_digest is not None
        return self.current_path().verify(self.root(), self.leaf_digest)
