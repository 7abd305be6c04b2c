"""Converter adapters for encryption schemes.

Reference parity: openzl-crypto/src/encryption/convert/{plaintext,key,
header}.rs — adapters that wrap an encryption scheme and convert between an
outer ("target") type and the scheme's native type on the way in/out:
plaintext conversion is bidirectional (`Forward` into the scheme on
encrypt, `Reverse` out of it on decrypt), key and header conversions are
forward-only. Most of the reference's 732 LoC is trait plumbing that duck
typing dissolves; what remains semantically is this composition, which is
what downstream protocols use to encrypt structured values (e.g. a note
struct) with a field-element scheme.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


def _identity(x):
    return x


@dataclasses.dataclass(frozen=True)
class ConvertedScheme:
    """Wrap `base` with type converters.

    forward_plaintext: outer plaintext -> base plaintext (convert/plaintext.rs
    `Forward`); reverse_plaintext: base plaintext -> outer plaintext
    (`Reverse`); forward_key / forward_header: outer -> base
    (convert/key.rs:19-57, convert/header.rs:19-35).
    """

    base: object
    forward_plaintext: Callable = _identity
    reverse_plaintext: Callable = _identity
    forward_key: Callable = _identity
    forward_header: Callable = _identity

    def encrypt(self, key, header, plaintext):
        return self.base.encrypt(
            self.forward_key(key),
            self.forward_header(header),
            self.forward_plaintext(plaintext),
        )

    def decrypt(self, key, message) -> Optional[object]:
        out = self.base.decrypt(self.forward_key(key), message)
        return None if out is None else self.reverse_plaintext(out)
