"""Poseidon duplex-sponge authenticated encryption (COM-generic).

Mirrors the reference's duplex AEAD instantiation for Poseidon
(openzl-crypto/src/poseidon/encryption.rs + permutation/duplex.rs:208-303):

  * setup: state starts at `initial_state`; key then header are split into
    width-1 blocks (zero-padded) and absorbed additively
    (encryption.rs:663-684, SetupBlock write :82-88)
  * encryption: each plaintext block is added into state[1..]; the new
    state[1..] is the ciphertext block; permute between blocks
    (PlaintextBlock write :144-151)
  * decryption: plaintext[i] = ciphertext[i] - state[i+1]; the state lane is
    REPLACED by the ciphertext element (CiphertextBlock write :257-265) —
    this makes decrypt(encrypt(m)) state-trajectory identical, so the tags
    match exactly
  * tag = state[1] after the final permute (Tag read :487-490)

Runs under any compiler (native ints, batched JAX arrays, R1CS trace) since
it only uses `com.add`/`com.sub`/`com.constant`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ...ref.poseidon import PoseidonParams
from ..permutation import PoseidonPermutation
from ..permutation.sponge import Sponge


def _padded_chunks(com, values: Sequence, size: int) -> List[List]:
    zero = com.constant(0)
    out = []
    for i in range(0, max(len(values), 1), size):
        chunk = list(values[i : i + size])
        chunk += [zero] * (size - len(chunk))
        out.append(chunk)
    return out


class _SetupBlock:
    def __init__(self, values):
        self.values = values

    def write(self, state, com):
        for i, v in enumerate(self.values):
            state[i + 1] = com.add(state[i + 1], v)


class _PlaintextBlock:
    def __init__(self, values):
        self.values = values

    def write(self, state, com):
        for i, v in enumerate(self.values):
            state[i + 1] = com.add(state[i + 1], v)
        return list(state[1:])


class _CiphertextBlock:
    def __init__(self, values):
        self.values = values

    def write(self, state, com):
        plaintext = []
        for i, v in enumerate(self.values):
            plaintext.append(com.sub(v, state[i + 1]))
            state[i + 1] = v
        return plaintext


@dataclasses.dataclass(frozen=True)
class FixedDuplexer:
    """Fixed-block-count Poseidon AEAD (reference `FixedDuplexer<N, S>`)."""

    params: PoseidonParams
    n_blocks: int

    @property
    def block_size(self) -> int:
        return self.params.width - 1

    def _setup(self, com, key: Sequence, header: Sequence) -> List:
        perm = PoseidonPermutation(self.params)
        state = [com.constant(0) for _ in range(self.params.width)]
        sponge = Sponge(perm, state)
        blocks = [
            _SetupBlock(b) for b in _padded_chunks(com, key, self.block_size)
        ] + [
            _SetupBlock(b) for b in _padded_chunks(com, header, self.block_size)
        ]
        sponge.absorb_all(blocks, com)
        return state

    def _check(self, msg: Sequence):
        assert len(msg) == self.n_blocks * self.block_size, (
            f"message must be exactly {self.n_blocks} blocks of "
            f"{self.block_size} field elements"
        )

    def encrypt(self, com, key: Sequence, header: Sequence, plaintext: Sequence):
        """-> (tag, ciphertext elements)."""
        self._check(plaintext)
        state = self._setup(com, key, header)
        sponge = Sponge(PoseidonPermutation(self.params), state)
        blocks = [
            _PlaintextBlock(plaintext[i : i + self.block_size])
            for i in range(0, len(plaintext), self.block_size)
        ]
        cipher_blocks = sponge.absorb_all(blocks, com)
        tag = state[1]
        return tag, [x for b in cipher_blocks for x in b]

    def decrypt(self, com, key: Sequence, header: Sequence, ciphertext: Sequence):
        """-> (tag, plaintext elements); verify by comparing tags."""
        self._check(ciphertext)
        state = self._setup(com, key, header)
        sponge = Sponge(PoseidonPermutation(self.params), state)
        blocks = [
            _CiphertextBlock(ciphertext[i : i + self.block_size])
            for i in range(0, len(ciphertext), self.block_size)
        ]
        plain_blocks = sponge.absorb_all(blocks, com)
        tag = state[1]
        return tag, [x for b in plain_blocks for x in b]

    def decrypt_verified(
        self, com, key, header, ciphertext, expected_tag
    ) -> Tuple[Optional[List], object]:
        """Native-mode authenticated decryption: None when the tag mismatches
        (the reference's `Verify` impl, encryption.rs:686-703)."""
        tag, plaintext = self.decrypt(com, key, header, ciphertext)
        ok = com.is_eq(tag, expected_tag)
        return (plaintext if ok else None), ok
