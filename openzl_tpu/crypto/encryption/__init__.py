"""Encryption framework (reference openzl-crypto/src/encryption/mod.rs).

The reference's component-type machinery (Header/Ciphertext/Key/Plaintext/
Randomness + Encrypt/Decrypt/Derive traits, encryption/mod.rs:46-245)
collapses in Python to a small scheme protocol:

  encrypt(key, randomness, header, plaintext) -> ciphertext
  decrypt(key, header, ciphertext)            -> plaintext | None

`PoseidonAEAD` is the duplex-sponge symmetric scheme (the reference's
`FixedDuplexer` instantiation); `hybrid.Hybrid` is the KEM/DEM composition.
`EmptyHeader` mirrors encryption/mod.rs EmptyHeader.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ...eclair.compilers import NativeCompiler
from ...fields.spec import FieldSpec
from ...ref.poseidon import PoseidonParams
from ..poseidon.encryption import FixedDuplexer

EMPTY_HEADER: tuple = ()


@dataclasses.dataclass(frozen=True)
class EncryptedMessage:
    """Ciphertext with its authentication tag and header
    (reference encryption/mod.rs:497-760 `EncryptedMessage`)."""

    tag: int
    ciphertext: Tuple[int, ...]
    header: tuple = EMPTY_HEADER


@dataclasses.dataclass(frozen=True)
class PoseidonAEAD:
    """Symmetric authenticated encryption over field-element messages."""

    spec: FieldSpec
    n_blocks: int

    def _duplexer(self) -> FixedDuplexer:
        params = PoseidonParams.generate(
            self.spec, width=3, full_rounds=8, partial_rounds=55
        )
        return FixedDuplexer(params, self.n_blocks)

    @property
    def message_len(self) -> int:
        return self.n_blocks * 2  # width-1 elements per block

    def encrypt(
        self,
        key: Sequence[int],
        header: Sequence[int],
        plaintext: Sequence[int],
    ) -> EncryptedMessage:
        com = NativeCompiler(self.spec)
        tag, ct = self._duplexer().encrypt(com, list(key), list(header), list(plaintext))
        return EncryptedMessage(tag=tag, ciphertext=tuple(ct), header=tuple(header))

    def decrypt(
        self, key: Sequence[int], message: EncryptedMessage
    ) -> Optional[List[int]]:
        com = NativeCompiler(self.spec)
        plaintext, ok = self._duplexer().decrypt_verified(
            com, list(key), list(message.header), list(message.ciphertext), message.tag
        )
        return plaintext if ok else None
