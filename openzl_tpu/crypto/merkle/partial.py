"""Partial Merkle tree: stores only the provable suffix of leaves.

Reference: openzl-crypto/src/merkle_tree/partial.rs:19-347 (`Partial` keeps
leaf digests from a starting index plus the partial inner tree). TPU-first
re-design: each level holds a dense suffix array of node digests starting at
an even base index; prefix nodes are frozen (their subtrees are full), so
pushes touch only the suffix, hashed level-by-level in batches exactly like
the dense tree. `trim` advances the starting index, dropping storage for
older leaves while keeping the same root.

Memory: O(count - start + height) digests versus the dense tree's O(count).
Roots/paths match the dense `MerkleTree` bit-for-bit for kept indices.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .path import MerklePath
from .tree import MerkleParameters, _build_level_bucketed


def _base(start: int, level: int) -> int:
    """First stored node index at `level`: the kept range rounded down to an
    even boundary so sibling pairs stay aligned (the extra node, when start
    is odd at that level, is the frozen left sibling needed for proofs)."""
    return (start >> level) & ~1


@dataclasses.dataclass(frozen=True)
class PartialMerkleTree:
    parameters: MerkleParameters
    start: int  # first kept (provable) leaf index
    count: int  # total leaves ever pushed (global indexing)
    levels: tuple  # levels[l]: (n_limbs, len) nodes [base(l), base(l)+len)

    @classmethod
    def empty(cls, parameters: MerkleParameters) -> "PartialMerkleTree":
        n = parameters.spec.n_limbs
        levels = tuple(
            np.zeros((n, 0), dtype=np.uint32) for _ in range(parameters.height)
        )
        return cls(parameters, 0, 0, levels)

    @classmethod
    def from_leaf_digests(
        cls, parameters: MerkleParameters, digests: np.ndarray
    ) -> "PartialMerkleTree":
        return cls.empty(parameters).push_leaf_digests(digests)

    def __len__(self) -> int:
        return self.count

    @property
    def starting_leaf_index(self) -> int:
        return self.start

    def root(self) -> np.ndarray:
        top = self.levels[-1]
        if top.shape[1] == 0:
            return np.zeros(self.parameters.spec.n_limbs, dtype=np.uint32)
        return top[:, 0]

    def _node(self, level: int, index: int) -> np.ndarray:
        """Stored digest at global (level, index); zero for absent nodes.
        Asserts the node was not trimmed away."""
        arr = self.levels[level]
        local = index - _base(self.start, level)
        occupied = -(-self.count // (1 << level))
        if index >= occupied:
            return np.zeros(self.parameters.spec.n_limbs, dtype=np.uint32)
        assert local >= 0, f"node ({level},{index}) was trimmed"
        return arr[:, local]

    def push_leaf_digests(self, digests: np.ndarray) -> "PartialMerkleTree":
        """Append a batch; same per-level suffix rebuild as the dense tree,
        operating in local (suffix) coordinates."""
        digests = np.asarray(digests)
        add = digests.shape[1]
        if add == 0:
            return self
        new_count = self.count + add
        assert new_count <= self.parameters.capacity
        new_levels = [np.concatenate([self.levels[0], digests], axis=1)]
        current = new_levels[0]
        start_g = self.count  # first dirty GLOBAL index at current level
        for level in range(1, self.parameters.height):
            parent_start_g = start_g >> 1
            child_base = _base(self.start, level - 1)
            parent_base = _base(self.start, level)
            # children of [parent_start_g, ...) in local child coordinates
            dirty = current[:, parent_start_g * 2 - child_base :]
            rebuilt = _build_level_bucketed(self.parameters, dirty)
            prev = self.levels[level][:, : parent_start_g - parent_base]
            new_level = np.concatenate([prev, rebuilt], axis=1)
            new_levels.append(new_level)
            current = new_level
            start_g = parent_start_g
        return PartialMerkleTree(
            self.parameters, self.start, new_count, tuple(new_levels)
        )

    def push(self, leaf_digest: np.ndarray) -> "PartialMerkleTree":
        return self.push_leaf_digests(np.asarray(leaf_digest).reshape(-1, 1))

    def trim(self, new_start: int) -> "PartialMerkleTree":
        """Drop storage for leaves below `new_start` (root unchanged;
        proofs for indices < new_start become unavailable)."""
        assert self.start <= new_start <= self.count
        new_levels = []
        for level in range(self.parameters.height):
            shift = _base(new_start, level) - _base(self.start, level)
            new_levels.append(self.levels[level][:, shift:])
        return PartialMerkleTree(
            self.parameters, new_start, self.count, tuple(new_levels)
        )

    def leaf_digest(self, index: int) -> np.ndarray:
        assert self.start <= index < self.count, "leaf not stored"
        return self.levels[0][:, index - _base(self.start, 0)]

    def path(self, index: int) -> MerklePath:
        """Membership path for a kept leaf (index >= start)."""
        assert self.start <= index < self.count, "leaf not provable"
        sibling_leaf = self._node(0, index ^ 1)
        inner = []
        node = index >> 1
        for level in range(1, self.parameters.height - 1):
            inner.append(self._node(level, node ^ 1))
            node >>= 1
        inner_arr = (
            np.stack(inner, axis=1)
            if inner
            else np.zeros(
                (self.parameters.spec.n_limbs, 0), dtype=np.uint32
            )
        )
        return MerklePath(self.parameters, index, sibling_leaf, inner_arr)
