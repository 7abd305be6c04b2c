"""Key agreement (reference openzl-crypto/src/key/agreement.rs:7-123 and
algebra/diffie_hellman.rs:28-56).

`DiffieHellman` over any :class:`~openzl_tpu.crypto.algebra.CurveGroup`:
  derive(sk)            = sk * G            (SecretKey -> PublicKey)
  agree(sk, pk)         = sk * pk           (-> SharedSecret)
  derive_ephemeral / generate_secret for the hybrid-encryption flow.
"""

from __future__ import annotations

import dataclasses

from ..algebra import CurveGroup


@dataclasses.dataclass(frozen=True)
class DiffieHellman:
    group: CurveGroup

    def generate_secret(self, rng) -> int:
        return self.group.sample_scalar(rng)

    def derive(self, secret_key: int):
        return self.group.scalar_mul(secret_key, self.group.generator())

    derive_ephemeral = derive

    def agree(self, secret_key: int, public_key):
        return self.group.scalar_mul(secret_key, public_key)

    def reconstruct_secret(self, public_key, secret_key: int):
        return self.agree(secret_key, public_key)
