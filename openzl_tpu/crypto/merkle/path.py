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
