"""Reusable Merkle test kit: mock hash configuration + standard assertions.

Reference parity: openzl-crypto/src/merkle_tree/test.rs:91-265 exports a
mock `TestHash` configuration and helpers (`push_twice_to_empty_tree_
succeeds`, `assert_valid_path(s)`) so downstream users can test tree logic
without paying for real crypto. Here the mock join is a cheap linear limb
operation (2*lhs + rhs + 1 mod p) — collision-prone by design, microseconds
per level, structurally exercising exactly the same tree/path/fork code as
the Poseidon configuration.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax.numpy as jnp

from ...fields import limb
from ...fields.spec import FieldSpec
from .tree import MerkleTree


@dataclasses.dataclass(frozen=True, eq=False)
class MockParameters:
    """Duck-types MerkleParameters with a non-cryptographic join.

    eq=False: jit static-arg hashing by identity, like MerkleParameters.
    """

    spec: FieldSpec
    height: int

    @property
    def capacity(self) -> int:
        return 1 << (self.height - 1)

    @property
    def path_length(self) -> int:
        return self.height - 2

    def join(self, lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        two = limb.add(self.spec, lhs, lhs)
        acc = limb.add(self.spec, two, rhs)
        one = jnp.asarray(
            limb.pack_mont(self.spec, 1).reshape(
                (self.spec.n_limbs,) + (1,) * (acc.ndim - 1)
            )
        )
        return limb.add(self.spec, acc, jnp.broadcast_to(one, acc.shape))

    join_leaves = join

    def digest(self, leaf: jnp.ndarray) -> jnp.ndarray:
        return leaf

    def default_digest(self, batch=()) -> jnp.ndarray:
        return limb.zeros(self.spec, batch)


@functools.lru_cache(maxsize=None)
def mock_parameters(spec: FieldSpec, height: int) -> MockParameters:
    return MockParameters(spec, height)


def push_twice_to_empty_tree_succeeds(parameters, leaf_a, leaf_b) -> MerkleTree:
    """Reference test.rs:91-117: two pushes into an empty tree both succeed
    and the tree reports the right length."""
    tree = MerkleTree.empty(parameters)
    tree = tree.push(leaf_a)
    assert len(tree) == 1
    tree = tree.push(leaf_b)
    assert len(tree) == 2
    return tree


def assert_valid_path(tree: MerkleTree, index: int) -> None:
    """Path at `index` verifies against the current root (test.rs:119-143)."""
    path = tree.path(index)
    assert path.verify(tree.root(), tree.leaf_digest(index)), (
        f"path for leaf {index} failed verification"
    )


def assert_valid_paths(tree: MerkleTree) -> None:
    """Every stored leaf has a valid path (test.rs:145-157)."""
    for index in range(len(tree)):
        assert_valid_path(tree, index)
