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
from typing import Callable, List, Optional, Sequence, Tuple

from ...eclair.compilers import NativeCompiler
from ...fields.spec import FieldSpec
from ...ref.poseidon import PoseidonParams
from ..poseidon.encryption import FixedDuplexer

EMPTY_HEADER: tuple = ()


@dataclasses.dataclass(frozen=True)
class Message:
    """(header, plaintext) pair awaiting encryption
    (reference encryption/mod.rs:497-572 `Message`)."""

    plaintext: tuple
    header: tuple = EMPTY_HEADER

    def encrypt(self, cipher, key, randomness=None):
        """Encrypt against `cipher` (mod.rs:517-531 `Message::encrypt`).

        Randomized schemes (e.g. `hybrid.Hybrid`, whose randomness is the
        ephemeral secret) take the randomness between key and header,
        matching the reference `Encrypt::encrypt` argument order; duplex
        AEAD schemes are deterministic in (key, header, plaintext).
        """
        if randomness is None:
            return cipher.encrypt(key, self.header, self.plaintext)
        return cipher.encrypt(key, randomness, self.header, self.plaintext)


@dataclasses.dataclass(frozen=True)
class EncryptedMessage:
    """Ciphertext with its authentication tag and header
    (reference encryption/mod.rs:574-760 `EncryptedMessage`)."""

    tag: int
    ciphertext: Tuple[int, ...]
    header: tuple = EMPTY_HEADER

    def decrypt(self, cipher, key):
        """mod.rs:605-620 `EncryptedMessage::decrypt` (None on tag failure)."""
        return cipher.decrypt(key, self)

    def into(
        self,
        convert_header: Callable = lambda h: h,
        convert_ciphertext: Callable = lambda c: c,
    ) -> "EncryptedMessage":
        """Re-type header/ciphertext for another cipher
        (mod.rs:622-632 `EncryptedMessage::into`)."""
        return EncryptedMessage(
            tag=self.tag,
            ciphertext=tuple(convert_ciphertext(self.ciphertext)),
            header=tuple(convert_header(self.header)),
        )

    def eq(self, rhs: "EncryptedMessage", com):
        """In-compiler equality: AND over header/ciphertext/tag component
        equality (mod.rs:635-658 eclair PartialEq for EncryptedMessage)."""
        acc = com.is_eq(self.tag, rhs.tag)
        for a, b in zip(self.header, rhs.header):
            acc = com.and_(acc, com.is_eq(a, b))
        for a, b in zip(self.ciphertext, rhs.ciphertext):
            acc = com.and_(acc, com.is_eq(a, b))
        return acc

    def assert_equal(self, rhs: "EncryptedMessage", com) -> None:
        """Component-wise assert_eq — the cheaper in-circuit path
        (mod.rs:653-658 `assert_equal`)."""
        assert len(self.header) == len(rhs.header)
        assert len(self.ciphertext) == len(rhs.ciphertext)
        com.assert_eq(self.tag, rhs.tag)
        for a, b in zip(self.header, rhs.header):
            com.assert_eq(a, b)
        for a, b in zip(self.ciphertext, rhs.ciphertext):
            com.assert_eq(a, b)

    def extend_input(self, builder):
        """Header then ciphertext into a proof-system public-input builder
        (mod.rs:735-746 `Input` impl)."""
        for h in self.header:
            builder.extend_field(h)
        for c in self.ciphertext:
            builder.extend_field(c)
        builder.extend_field(self.tag)
        return builder

    def encode(self, writer, spec: FieldSpec):
        """Header, ciphertext, tag through a codec Writer
        (mod.rs:722-733 `Encode` impl)."""
        for h in self.header:
            writer.field(spec, h)
        for c in self.ciphertext:
            writer.field(spec, c)
        writer.field(spec, self.tag)
        return writer


class UnsafeOutput:
    """Phantom ciphertext for unconstrained in-circuit encryption
    (mod.rs:320-404 `UnsafeOutput`): compares equal to any other
    `UnsafeOutput`, encodes to nothing, extends no public input."""

    def eq(self, rhs, com):
        assert isinstance(rhs, UnsafeOutput)
        return com.bool_constant(True)

    def assert_equal(self, rhs, com) -> None:
        assert isinstance(rhs, UnsafeOutput)

    def extend_input(self, builder):
        return builder

    def encode(self, writer, spec=None):
        return writer

    def __eq__(self, other):  # native-mode comparison
        return isinstance(other, UnsafeOutput)

    def __hash__(self):
        return hash(UnsafeOutput)


@dataclasses.dataclass(frozen=True)
class UnsafeNoEncrypt:
    """Lift a scheme to an 'unsafe non-encrypting' one: `encrypt` ignores
    everything and returns `UnsafeOutput` (mod.rs:406-487 `UnsafeNoEncrypt`
    — disables in-circuit encryption verification; underconstrained by
    design, use with caution)."""

    base: object

    def encrypt(self, key, header, plaintext) -> UnsafeOutput:
        del key, header, plaintext
        return UnsafeOutput()


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


def correctness(
    cipher,
    encryption_key,
    decryption_key,
    header: Sequence,
    plaintext: Sequence,
    randomness=None,
    assert_same=None,
) -> None:
    """Encrypt-then-decrypt round-trip test helper (reference
    encryption/mod.rs:762-816 `test::correctness`): encryption of
    `plaintext` under `encryption_key` must decrypt to the original under
    `decryption_key`. `assert_same` customizes the plaintext comparison."""
    msg = Message(plaintext=tuple(plaintext), header=tuple(header))
    encrypted = msg.encrypt(cipher, encryption_key, randomness)
    decrypted = cipher.decrypt(decryption_key, encrypted)
    assert decrypted is not None, "decryption rejected an honest ciphertext"
    if assert_same is None:
        assert list(decrypted) == list(plaintext), (decrypted, plaintext)
    else:
        assert_same(decrypted, plaintext)
