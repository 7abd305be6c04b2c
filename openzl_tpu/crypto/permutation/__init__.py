"""Pseudorandom permutations (reference openzl-crypto/src/permutation/mod.rs).

A permutation here is any object with `width` and `permute(com, state)` where
`state` is a list of COM field values. :class:`PoseidonPermutation` adapts the
COM-generic Poseidon gadget; the sponge/duplex constructions build on this
protocol exactly like the reference's `PseudorandomPermutation` trait
(permutation/mod.rs:10-18).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

from ...ref.poseidon import PoseidonParams
from ..poseidon import gadget as poseidon_gadget


@dataclasses.dataclass(frozen=True)
class PoseidonPermutation:
    """Poseidon as a `PseudorandomPermutation` over COM field values."""

    params: PoseidonParams

    @property
    def width(self) -> int:
        return self.params.width

    def permute(self, com, state: Sequence) -> List:
        return poseidon_gadget.permute(com, self.params, state)
