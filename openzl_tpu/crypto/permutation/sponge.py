"""Generic sponge over a pseudorandom permutation.

Mirrors the reference (openzl-crypto/src/permutation/sponge.rs:35-110):
`absorb` = write a block into the state then permute; `squeeze` = read then
permute. Blocks are writer objects with `write(state, com) -> output`.
"""

from __future__ import annotations

from typing import List, Sequence


class Sponge:
    """Stateful sponge; `state` is a mutable list of COM field values."""

    def __init__(self, permutation, state: List):
        self.permutation = permutation
        self.state = state

    def write(self, block, com):
        return block.write(self.state, com)

    def absorb(self, block, com):
        out = self.write(block, com)
        self.state[:] = self.permutation.permute(com, self.state)
        return out

    def absorb_all(self, blocks: Sequence, com) -> List:
        return [self.absorb(b, com) for b in blocks]

    def read(self, reader_cls, com):
        return reader_cls.read(self.state, com)

    def squeeze(self, reader_cls, com):
        out = self.read(reader_cls, com)
        self.state[:] = self.permutation.permute(com, self.state)
        return out
