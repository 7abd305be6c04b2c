"""Hybrid (KEM/DEM) encryption (reference encryption/hybrid.rs:60-430).

`Hybrid` = key-agreement scheme + base symmetric scheme: the ciphertext
carries the ephemeral public key; randomness = the ephemeral secret
(hybrid.rs `Randomness`); the DEM key is derived from the agreed shared
secret (point coordinates reduced into the DEM field).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ..key import DiffieHellman
from . import EncryptedMessage, PoseidonAEAD


@dataclasses.dataclass(frozen=True)
class HybridCiphertext:
    """(ephemeral public key, base ciphertext) — hybrid.rs `Ciphertext`."""

    ephemeral_public_key: Tuple[int, int]
    message: EncryptedMessage


@dataclasses.dataclass(frozen=True)
class Hybrid:
    key_agreement: DiffieHellman
    base: PoseidonAEAD

    def _dem_key(self, shared_secret) -> List[int]:
        p = self.base.spec.modulus
        if shared_secret is None:
            return [0, 0]
        return [shared_secret[0] % p, shared_secret[1] % p]

    def encrypt(
        self,
        receiving_key: Tuple[int, int],
        ephemeral_secret: int,
        header: Sequence[int],
        plaintext: Sequence[int],
    ) -> HybridCiphertext:
        epk = self.key_agreement.derive_ephemeral(ephemeral_secret)
        shared = self.key_agreement.agree(ephemeral_secret, receiving_key)
        msg = self.base.encrypt(self._dem_key(shared), header, plaintext)
        return HybridCiphertext(ephemeral_public_key=epk, message=msg)

    def decrypt(
        self, secret_key: int, ciphertext: HybridCiphertext
    ) -> Optional[List[int]]:
        shared = self.key_agreement.reconstruct_secret(
            ciphertext.ephemeral_public_key, secret_key
        )
        return self.base.decrypt(self._dem_key(shared), ciphertext.message)
