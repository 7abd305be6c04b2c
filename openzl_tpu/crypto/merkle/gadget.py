"""COM-generic Merkle membership verification.

The in-circuit analogue of the reference's `PathVar::root` fold
(openzl-crypto/src/merkle_tree/path.rs:986-1030): at each level swap
(accumulator, sibling) by the index bit, then join with Poseidon. Under the
R1CS compiler each swap costs 1 constraint and each join one Poseidon hash;
under the native/JAX compilers this is exactly the verification fold used by
:mod:`openzl_tpu.crypto.merkle.path`.
"""

from __future__ import annotations

from typing import Sequence

from ...ref.poseidon import PoseidonParams
from ..poseidon import gadget as poseidon_gadget


def path_root(
    com,
    params: PoseidonParams,
    leaf_digest,
    sibling_digest,
    inner_path: Sequence,
    index_bits: Sequence,
):
    """Recompute the root implied by a membership path.

    index_bits: little-endian node-parity bits, bools/Booleans of length
    len(inner_path) + 1 (bit l = is-right-child at level l; reference
    path.rs:105-166 join ordering).
    """
    assert len(index_bits) == len(inner_path) + 1
    lhs, rhs = com.swap(index_bits[0], leaf_digest, sibling_digest)
    acc = poseidon_gadget.hash(com, params, [lhs, rhs])
    for sibling, bit in zip(inner_path, index_bits[1:]):
        lhs, rhs = com.swap(bit, acc, sibling)
        acc = poseidon_gadget.hash(com, params, [lhs, rhs])
    return acc


def assert_membership(
    com,
    params: PoseidonParams,
    root,
    leaf_digest,
    sibling_digest,
    inner_path: Sequence,
    index_bits: Sequence,
):
    """assert_valid: computed root equals the public root
    (reference merkle_tree/tree.rs:736-745)."""
    computed = path_root(
        com, params, leaf_digest, sibling_digest, inner_path, index_bits
    )
    return com.assert_eq(computed, root)
