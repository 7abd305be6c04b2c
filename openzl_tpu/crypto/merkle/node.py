"""Merkle tree node index algebra.

Level-wise node coordinates with parent/sibling/children arithmetic, mirroring
the reference semantics (openzl-crypto/src/merkle_tree/node.rs:19-371): a node
at a level is indexed left-to-right from 0; even indices are left children.

Host-side Python ints (tree bookkeeping is a cold path); the batched/in-circuit
parity logic lives in path.py as jnp ops over index bit decompositions.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator


def is_left(index: int) -> bool:
    return index % 2 == 0


def sibling(index: int) -> int:
    return index ^ 1


def parent(index: int) -> int:
    return index >> 1


def left_child(index: int) -> int:
    return index << 1


def right_child(index: int) -> int:
    return (index << 1) | 1


@dataclasses.dataclass(frozen=True)
class Node:
    """A node index at some level of the tree."""

    index: int

    def is_left(self) -> bool:
        return is_left(self.index)

    def sibling(self) -> "Node":
        return Node(sibling(self.index))

    def parent(self) -> "Node":
        return Node(parent(self.index))

    def children(self) -> tuple["Node", "Node"]:
        return Node(left_child(self.index)), Node(right_child(self.index))

    def parents(self) -> Iterator["Node"]:
        """Iterator over strictly higher ancestors (reference `NodeParents`)."""
        node = self
        while node.index > 0:
            node = node.parent()
            yield node

    def join_order(self, lhs, rhs):
        """Order (self, sibling) payloads as (left, right) by parity."""
        return (lhs, rhs) if self.is_left() else (rhs, lhs)
