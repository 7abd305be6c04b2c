"""TPU-native Merkle tree: array-resident levels, batched level-by-level hashing.

Replaces the reference's pointer-based tree structures
(openzl-crypto/src/merkle_tree/{tree,inner_tree,full,partial}.rs) with a
functional design: a tree is an immutable dataclass holding one digest array
per level; bulk construction hashes an entire level per Poseidon batch (the
TPU-friendly axis), and incremental pushes update the O(height) current path.

Semantics matched to the reference:
  * capacity = 2^(HEIGHT-1), path = sibling leaf + (HEIGHT-2) inner digests
    (tree.rs:196-216)
  * absent siblings read as the sentinel default digest (zero), not as a hash
    of zeros (inner_tree.rs Sentinel semantics, inner_tree.rs:282-370)
  * joins order (lhs, rhs) by node parity (node.rs / path.rs:105-166)

Copy-on-write forking and rollback (reference fork.rs, persistence.rs) are
free here: trees are immutable values, so `fork = tree` and rollback is
keeping the old object. See fork.py for the explicit API.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ...fields import limb
from ...fields.spec import FieldSpec
from ..poseidon.permutation import Poseidon


@dataclasses.dataclass(frozen=True)
class MerkleParameters:
    """Hash parameters: Poseidon arity-2 joins over a field, identity leaf hash.

    `digest` maps a leaf to a leaf digest (identity by default, matching the
    reference's `IdentityLeafHash` for field-element leaves, tree.rs:68-90).
    """

    spec: FieldSpec
    height: int  # HEIGHT; capacity = 2^(height-1), height >= 2

    @functools.cached_property
    def poseidon(self) -> Poseidon:
        return Poseidon.create(self.spec, arity=2)

    @property
    def capacity(self) -> int:
        return 1 << (self.height - 1)

    @property
    def path_length(self) -> int:
        return self.height - 2

    # batched: lhs/rhs (n_limbs, *batch) Montgomery form -> (n_limbs, *batch)
    def join(self, lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        return self.poseidon.hash(jnp.stack([lhs, rhs], axis=1))

    join_leaves = join

    @functools.cached_property
    def _int_params(self):
        from ...ref import poseidon as refposeidon

        perm = self.poseidon
        return refposeidon.PoseidonParams.generate(
            self.spec, perm.width, perm.full_rounds, perm.partial_rounds
        )

    def join_ints(self, lhs: np.ndarray, rhs: np.ndarray) -> np.ndarray:
        """Single-pair join on the HOST python-int oracle.

        For batch-1 joins (incremental CurrentPath pushes) the device path
        is strictly worse: per-call dispatch overhead dominates and every
        new shape costs an XLA compile. Bit-identical to `join` (the oracle
        is golden-vector pinned)."""
        from ...fields import limb as limb_mod
        from ...ref import poseidon as refposeidon

        li = int(limb_mod.unpack_mont(self.spec, np.asarray(lhs)))
        ri = int(limb_mod.unpack_mont(self.spec, np.asarray(rhs)))
        out = refposeidon.hash(self._int_params, [li, ri])
        return limb_mod.pack_mont(self.spec, out)

    def digest(self, leaf: jnp.ndarray) -> jnp.ndarray:
        return leaf

    def default_digest(self, batch=()) -> jnp.ndarray:
        return limb.zeros(self.spec, batch)


@dataclasses.dataclass(frozen=True)
class MerkleTree:
    """Immutable Merkle tree; level `l` holds digests of occupied nodes only.

    levels[0] = leaf digests (count entries); levels[l] has ceil over 2^l;
    levels[height-1] = [root] once non-empty.
    """

    parameters: MerkleParameters
    count: int
    levels: tuple  # tuple of np.ndarray (n_limbs, occupied_l)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def empty(cls, parameters: MerkleParameters) -> "MerkleTree":
        n = parameters.spec.n_limbs
        levels = tuple(
            np.zeros((n, 0), dtype=np.uint32) for _ in range(parameters.height)
        )
        return cls(parameters, 0, levels)

    @classmethod
    def from_leaf_digests(
        cls, parameters: MerkleParameters, digests: np.ndarray
    ) -> "MerkleTree":
        """Bulk batched build: one Poseidon batch per level.

        Large builds route through `_build_level_masked`, a SINGLE jitted
        shape reused by every level: the buffer stays at the padded leaf
        width W for all height-1 steps, with the occupied width carried as
        a device scalar (mask + re-pad inside the trace). One XLA compile
        per tree size instead of one per level — at height 20 the per-level
        hash work (~W/2 pairs) is milliseconds while each distinct compiled
        shape costs tens of seconds on TPU, so constant-shape wins by ~20x
        on cold builds.
        """
        digests = np.asarray(digests)
        count = digests.shape[1]
        assert count <= parameters.capacity
        levels = [digests]
        if count > _MASKED_BUILD_MIN:
            W = 1 << (count - 1).bit_length()
            buf = jnp.asarray(digests)
            if W != count:
                buf = jnp.concatenate(
                    [
                        buf,
                        jnp.zeros(
                            (buf.shape[0], W - count), dtype=buf.dtype
                        ),
                    ],
                    axis=1,
                )
            flat = np.asarray(
                _build_levels_scanned(parameters, parameters.height, count, buf)
            )
            w, off = count, 0
            for _ in range(parameters.height - 1):
                w = (w + 1) // 2
                levels.append(flat[:, off : off + w])
                off += w
            return cls(parameters, count, tuple(levels))
        current = digests
        for _ in range(parameters.height - 1):
            current = np.asarray(_build_level(parameters, jnp.asarray(current)))
            levels.append(current)
        return cls(parameters, count, tuple(levels))

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    @property
    def spec(self) -> FieldSpec:
        return self.parameters.spec

    def __len__(self) -> int:
        return self.count

    def root(self) -> np.ndarray:
        """(n_limbs,) Montgomery-form root digest (zero digest when empty)."""
        top = self.levels[-1]
        if top.shape[1] == 0:
            return np.zeros(self.spec.n_limbs, dtype=np.uint32)
        return top[:, 0]

    def leaf_digest(self, index: int) -> np.ndarray:
        return self.levels[0][:, index]

    def _node_digest(self, level: int, index: int) -> np.ndarray:
        arr = self.levels[level]
        if index < arr.shape[1]:
            return arr[:, index]
        return np.zeros(self.spec.n_limbs, dtype=np.uint32)

    # ------------------------------------------------------------------
    # updates (functional)
    # ------------------------------------------------------------------

    def push_leaf_digests(self, digests: np.ndarray) -> "MerkleTree":
        """Append a batch of leaf digests, rebuilding only affected suffixes.

        Each level recomputes nodes covering the appended range — batched, so
        bulk extends cost ~2x the new leaves' hashes (amortized optimal).
        """
        digests = np.asarray(digests)
        add = digests.shape[1]
        if add == 0:
            return self
        new_count = self.count + add
        assert new_count <= self.parameters.capacity
        new_levels = [np.concatenate([self.levels[0], digests], axis=1)]
        start = self.count  # first dirty index at current level
        current = new_levels[0]
        for level in range(1, self.parameters.height):
            parent_start = start >> 1
            dirty = current[:, parent_start * 2 :]
            rebuilt = _build_level_bucketed(self.parameters, dirty)
            prev = self.levels[level][:, :parent_start]
            new_level = np.concatenate([prev, rebuilt], axis=1)
            new_levels.append(new_level)
            current = new_level
            start = parent_start
        return MerkleTree(self.parameters, new_count, tuple(new_levels))

    def push(self, leaf_digest: np.ndarray) -> "MerkleTree":
        return self.push_leaf_digests(np.asarray(leaf_digest).reshape(-1, 1))

    # ------------------------------------------------------------------
    # membership proofs
    # ------------------------------------------------------------------

    def path(self, index: int) -> "MerklePath":
        from .path import MerklePath  # cycle-free local import

        assert 0 <= index < self.count
        sibling_leaf = self._node_digest(0, index ^ 1)
        inner = []
        node = index >> 1
        for level in range(1, self.parameters.height - 1):
            inner.append(self._node_digest(level, node ^ 1))
            node >>= 1
        inner_arr = (
            np.stack(inner, axis=1)
            if inner
            else np.zeros((self.spec.n_limbs, 0), dtype=np.uint32)
        )
        return MerklePath(self.parameters, index, sibling_leaf, inner_arr)


def _build_level_bucketed(
    parameters: MerkleParameters, dirty: np.ndarray
) -> np.ndarray:
    """`_build_level` with the width padded to a power of two.

    Incremental pushes produce dirty suffixes of arbitrary width; hashing
    them directly would re-trace `_build_level` for every distinct width
    (a recompile per insert at a new size). Padding to pow2 buckets bounds
    the trace count at log2(capacity) per level while hashing at most 2x
    the needed pairs; the padded outputs are sliced away.
    """
    w = dirty.shape[1]
    if w == 0:
        return dirty
    W = 1 << max(1, (w - 1).bit_length())
    if W != w:
        dirty = np.concatenate(
            [dirty, np.zeros((dirty.shape[0], W - w), dtype=dirty.dtype)],
            axis=1,
        )
    rebuilt = np.asarray(_build_level(parameters, jnp.asarray(dirty)))
    return rebuilt[:, : (w + 1) // 2]


#: bulk builds above this leaf count use the constant-shape masked builder
_MASKED_BUILD_MIN = 4096


def _masked_step(
    parameters: MerkleParameters, buf: jnp.ndarray, occ: jnp.ndarray
):
    """One level step at a CONSTANT buffer width (single trace for a build).

    `buf` is (n_limbs, W) with W a power of two and entries at index >= occ
    all zero (the absent-subtree sentinel). Hashes all W/2 pairs, zeroes
    the parents beyond ceil(occ/2) (their inputs were padding), and re-pads
    to width W so the next level reuses this exact trace. Returns
    (new_buf, new_occ).
    """
    n, W = buf.shape
    pairs = jnp.swapaxes(buf.reshape(n, -1, 2), 1, 2)  # (n, 2, W/2)
    n_pairs = pairs.shape[2]
    if (
        n_pairs % 4096 == 0
        and jax.default_backend() == "tpu"
        and hasattr(parameters, "poseidon")
    ):
        from ...ops import poseidon_kernel

        hashed = poseidon_kernel.hash_batch(parameters.poseidon, pairs)
    else:
        hashed = parameters.join(pairs[:, 0], pairs[:, 1])  # (n, W/2)
    new_occ = (occ + 1) // 2
    mask = jnp.arange(n_pairs, dtype=jnp.int32) < new_occ
    hashed = jnp.where(mask[None, :], hashed, 0)
    new_buf = jnp.concatenate([hashed, jnp.zeros_like(hashed)], axis=1)
    return new_buf, new_occ


_build_level_masked = jax.jit(_masked_step, static_argnums=0)


#: smallest buffer width the in-jit build hashes at (= 4096 pairs, the
#: Poseidon Pallas kernel's grid quantum); narrower levels pad up to it
_SCAN_FLOOR = 8192


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _build_levels_scanned(
    parameters: MerkleParameters, height: int, count: int, buf: jnp.ndarray
):
    """All height-1 level steps in ONE dispatch (unrolled in-trace loop).

    The buffer halves per level until it reaches `_SCAN_FLOOR`, then stays
    constant (mask + re-pad), so the trace contains only
    log2(W/_SCAN_FLOOR)+1 distinct hash shapes — each compiled once and
    cached persistently — while hashing only ~2n + height*floor pairs
    total. Everything runs in one host->device round trip (through the
    axon relay each dispatch costs ~15 ms), and the per-level outputs come
    back as ONE flat array (a single readback) that the caller splits.
    """
    n = buf.shape[0]
    occ = jnp.asarray(count, dtype=jnp.int32)
    outs = []
    w = count
    for _ in range(height - 1):
        W = buf.shape[1]
        pairs = jnp.swapaxes(buf.reshape(n, -1, 2), 1, 2)  # (n, 2, W/2)
        n_pairs = pairs.shape[2]
        if (
            n_pairs % 4096 == 0
            and jax.default_backend() == "tpu"
            and hasattr(parameters, "poseidon")
        ):
            from ...ops import poseidon_kernel

            hashed = poseidon_kernel.hash_batch(parameters.poseidon, pairs)
        else:
            hashed = parameters.join(pairs[:, 0], pairs[:, 1])
        occ = (occ + 1) // 2
        mask = jnp.arange(n_pairs, dtype=jnp.int32) < occ
        hashed = jnp.where(mask[None, :], hashed, 0)
        w = (w + 1) // 2
        outs.append(hashed[:, :w])
        if W // 2 >= _SCAN_FLOOR:
            buf = hashed  # shrink: next level hashes half the pairs
        else:
            buf = jnp.concatenate([hashed, jnp.zeros_like(hashed)], axis=1)
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnums=0)
def _build_level(parameters: MerkleParameters, level: jnp.ndarray) -> jnp.ndarray:
    """Hash pairs of an occupied-level array into the parent level.

    Odd trailing node is joined with the zero sentinel; fully absent subtrees
    are never hashed (their digest is the sentinel itself).

    Wide levels (the bulk-build hot path) run through the Pallas VMEM kernel
    on TPU; narrow levels and other backends use the jnp path.
    """
    m = level.shape[1]
    if m == 0:
        return level
    if m % 2 == 1:
        level = jnp.concatenate(
            [level, jnp.zeros((level.shape[0], 1), dtype=level.dtype)], axis=1
        )
    pairs = jnp.swapaxes(level.reshape(level.shape[0], -1, 2), 1, 2)  # (n,2,m/2)
    n_pairs = pairs.shape[2]
    if (
        n_pairs % 4096 == 0
        and jax.default_backend() == "tpu"
        and hasattr(parameters, "poseidon")
    ):
        from ...ops import poseidon_kernel

        return poseidon_kernel.hash_batch(parameters.poseidon, pairs)
    return parameters.join(pairs[:, 0], pairs[:, 1])  # (n, m/2)
