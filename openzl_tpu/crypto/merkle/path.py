"""Merkle membership paths with batched verification.

Mirrors the reference's `Path` = sibling leaf digest + inner sibling digests
(openzl-crypto/src/merkle_tree/path.rs:628-775): the root is recomputed by
joining with the sibling at each level, ordering (acc, sibling) by the parity
of the node index (path.rs:105-166), and comparing with the expected root.

TPU-first: `verify_batch` folds many paths at once — one Poseidon batch per
level, with parity-ordered operands selected by index-bit masks. This is the
same fold the in-circuit gadget uses (eclair backend), so native and circuit
verification share one description.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ...fields import limb
from .tree import MerkleParameters


@dataclasses.dataclass(frozen=True)
class MerklePath:
    parameters: MerkleParameters
    leaf_index: int
    sibling_digest: np.ndarray  # (n_limbs,)
    inner_path: np.ndarray  # (n_limbs, height-2), leaf-adjacent first

    def root(self, leaf_digest: np.ndarray) -> np.ndarray:
        """Recompute the root implied by this path for `leaf_digest`."""
        index_bits = _index_bits(
            self.parameters, np.array([self.leaf_index], dtype=np.uint32)
        )
        out = _fold_root(
            self.parameters,
            jnp.asarray(np.asarray(leaf_digest).reshape(-1, 1)),
            jnp.asarray(self.sibling_digest.reshape(-1, 1)),
            jnp.asarray(self.inner_path[..., None]),
            jnp.asarray(index_bits),
        )
        return np.asarray(out)[:, 0]

    def verify(self, root: np.ndarray, leaf_digest: np.ndarray) -> bool:
        return bool((self.root(leaf_digest) == np.asarray(root)).all())


def verify_batch(
    parameters: MerkleParameters,
    roots: jnp.ndarray,  # (n_limbs, batch) or (n_limbs,) broadcast
    leaf_digests: jnp.ndarray,  # (n_limbs, batch)
    sibling_digests: jnp.ndarray,  # (n_limbs, batch)
    inner_paths: jnp.ndarray,  # (n_limbs, height-2, batch)
    leaf_indices: np.ndarray,  # (batch,) uint32
) -> jnp.ndarray:
    """Vectorized membership verification; returns a (batch,) bool mask."""
    bits = _index_bits(parameters, np.asarray(leaf_indices, dtype=np.uint32))
    got = _fold_root(
        parameters,
        jnp.asarray(leaf_digests),
        jnp.asarray(sibling_digests),
        jnp.asarray(inner_paths),
        jnp.asarray(bits),
    )
    if roots.ndim == 1:
        roots = roots[:, None]
    return limb.eq(got, jnp.asarray(roots))


def _index_bits(parameters: MerkleParameters, indices: np.ndarray) -> np.ndarray:
    """(height-1, batch) bool: bit l = parity of the node index at level l."""
    levels = parameters.height - 1
    return np.stack(
        [((indices >> l) & 1).astype(bool) for l in range(levels)], axis=0
    )


@functools.partial(jax.jit, static_argnums=0)
def _fold_root(
    parameters: MerkleParameters,
    leaf: jnp.ndarray,
    sibling: jnp.ndarray,
    inner: jnp.ndarray,
    bits: jnp.ndarray,
) -> jnp.ndarray:
    # leaf level: order by bit 0 (right child when set)
    lhs = limb.select(bits[0], sibling, leaf)
    rhs = limb.select(bits[0], leaf, sibling)
    acc = parameters.join_leaves(lhs, rhs)
    for level in range(parameters.path_length):
        sib = inner[:, level]
        bit = bits[level + 1]
        lhs = limb.select(bit, sib, acc)
        rhs = limb.select(bit, acc, sib)
        acc = parameters.join(lhs, rhs)
    return acc


# ---------------------------------------------------------------------------
# CurrentPath — the right-most path with O(height) state and update-on-push
# (reference openzl-crypto/src/merkle_tree/path.rs:778-913)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CurrentPath:
    """Compressed right-most path: per level, the pending LEFT child digest.

    From `frontier` + `count` both the root and the current leaf's membership
    path are derivable; `push` updates in O(height) joins. This is the
    O(height)-memory engine behind the single-path and partial storage
    variants (reference path.rs:778-913 CurrentPath, update-on-push at
    879+; same frontier idea as incremental deposit trees).
    """

    parameters: MerkleParameters
    count: int
    frontier: tuple  # per level 0..height-2: np (n_limbs,) last left child
    root_digest: np.ndarray  # (n_limbs,)

    @classmethod
    def empty(cls, parameters: MerkleParameters) -> "CurrentPath":
        n = parameters.spec.n_limbs
        zero = np.zeros(n, dtype=np.uint32)
        return cls(
            parameters,
            0,
            tuple(zero for _ in range(parameters.height - 1)),
            zero.copy(),
        )

    @property
    def leaf_index(self) -> int:
        assert self.count > 0
        return self.count - 1

    def _join(self, lhs: np.ndarray, rhs: np.ndarray) -> np.ndarray:
        if hasattr(self.parameters, "join_ints"):
            return self.parameters.join_ints(lhs, rhs)
        out = self.parameters.join(
            jnp.asarray(lhs.reshape(-1, 1)), jnp.asarray(rhs.reshape(-1, 1))
        )
        return np.asarray(out)[:, 0]

    def push(self, leaf_digest: np.ndarray) -> "CurrentPath":
        """Append a leaf: O(height) joins, matching the dense tree's root
        (zero sentinels stand in for absent right subtrees)."""
        idx = self.count
        assert idx < self.parameters.capacity
        node = np.asarray(leaf_digest)
        zero = np.zeros(self.parameters.spec.n_limbs, dtype=np.uint32)
        frontier = list(self.frontier)
        for level in range(self.parameters.height - 1):
            if (idx >> level) & 1 == 0:
                frontier[level] = node
                node = self._join(node, zero)
            else:
                node = self._join(frontier[level], node)
        return CurrentPath(self.parameters, idx + 1, tuple(frontier), node)

    def current_path(self) -> MerklePath:
        """Membership path of the most recent leaf (absent siblings = zero)."""
        assert self.count > 0
        idx = self.leaf_index
        zero = np.zeros(self.parameters.spec.n_limbs, dtype=np.uint32)
        sibling = self.frontier[0] if idx & 1 else zero
        inner = []
        for level in range(1, self.parameters.height - 1):
            node = idx >> level
            inner.append(self.frontier[level] if node & 1 else zero)
        inner_arr = (
            np.stack(inner, axis=1)
            if inner
            else np.zeros((self.parameters.spec.n_limbs, 0), dtype=np.uint32)
        )
        return MerklePath(self.parameters, idx, sibling, inner_arr)
