"""Copy-on-write forking and rollback (reference merkle_tree/fork.rs and
openzl-util/src/persistence.rs:7-24).

The reference needs `Trunk`/`Fork` pointer machinery because its trees are
mutable; our trees are immutable dataclasses, so a fork is a value and
rollback is keeping the old value. `ForkedTree` provides the reference's
`Rollback{rollback, commit}` interface (tree.rs:1128-1145) over that.
"""

from __future__ import annotations

from .tree import MerkleParameters, MerkleTree


class ForkedTree:
    """A tree with a pending fork; commit/rollback in O(1)."""

    def __init__(self, tree: MerkleTree):
        self._base = tree
        self._fork = tree

    @property
    def base(self) -> MerkleTree:
        return self._base

    @property
    def fork(self) -> MerkleTree:
        return self._fork

    def push(self, leaf_digest) -> None:
        self._fork = self._fork.push(leaf_digest)

    def push_leaf_digests(self, digests) -> None:
        self._fork = self._fork.push_leaf_digests(digests)

    def root(self):
        return self._fork.root()

    def commit(self) -> None:
        """Adopt the fork as the new base (reference Rollback::commit)."""
        self._base = self._fork

    def rollback(self) -> None:
        """Discard the fork (reference Rollback::rollback)."""
        self._fork = self._base
