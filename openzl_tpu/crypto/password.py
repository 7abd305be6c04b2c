"""Password hashing / password-hardened keys
(reference openzl-crypto/src/password.rs:10-49).

`Hasher` and `PasswordHash` protocol: a scheme turning low-entropy passwords
into field-element keys. The default instantiation iterates Poseidon over the
password bytes with a salt and a work factor (the reference leaves the
concrete hasher to downstream users)."""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

from ..fields.spec import FieldSpec
from ..ref import poseidon as refposeidon


@dataclasses.dataclass(frozen=True)
class PoseidonPasswordHasher:
    spec: FieldSpec
    iterations: int = 64

    def _params(self):
        return refposeidon.PoseidonParams.generate(
            self.spec, width=3, full_rounds=8, partial_rounds=55
        )

    def _absorb_bytes(self, data: bytes) -> List[int]:
        # 31-byte chunks stay below any ~254-bit modulus
        return [
            int.from_bytes(data[i : i + 31], "little")
            for i in range(0, max(len(data), 1), 31)
        ]

    def hash(self, password: bytes, salt: bytes = b"") -> int:
        params = self._params()
        acc = 0
        for block in self._absorb_bytes(salt) + self._absorb_bytes(password):
            acc = refposeidon.hash(params, [acc, block])
        for _ in range(self.iterations):
            acc = refposeidon.hash(params, [acc, acc])
        return acc

    def verify(self, password: bytes, salt: bytes, digest: int) -> bool:
        return self.hash(password, salt) == digest
