"""Ed25519 signatures (RFC 8032), the plugins/dalek equivalent
(reference plugins/dalek/src/ed25519.rs:18-145).

Pure-Python implementation (no external crypto dependency is available in
the image); host-side cold path — signing/verification of control-plane
messages, not a TPU compute path. Implements the openzl `Sign`/`Verify`
component interface shape: generate_key / derive / sign / verify.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional, Tuple

_P = 2**255 - 19
_L = 2**252 + 27742317777372353535851937790883648493
_D = (-121665 * pow(121666, -1, _P)) % _P

_BY = 4 * pow(5, -1, _P) % _P
_BX = None  # derived below


def _recover_x(y: int, sign: int) -> Optional[int]:
    x2 = (y * y - 1) * pow(_D * y * y + 1, -1, _P) % _P
    if x2 == 0:
        return None if sign else 0
    x = pow(x2, (_P + 3) // 8, _P)
    if (x * x - x2) % _P != 0:
        x = x * pow(2, (_P - 1) // 4, _P) % _P
    if (x * x - x2) % _P != 0:
        return None
    if (x & 1) != sign:
        x = _P - x
    return x


_BX = _recover_x(_BY, 0)
_B = (_BX, _BY, 1, _BX * _BY % _P)  # extended coordinates


def _ed_add(P, Q):
    x1, y1, z1, t1 = P
    x2, y2, z2, t2 = Q
    a = (y1 - x1) * (y2 - x2) % _P
    b = (y1 + x1) * (y2 + x2) % _P
    c = 2 * t1 * t2 * _D % _P
    d = 2 * z1 * z2 % _P
    e, f, g, h = b - a, d - c, d + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _ed_mul(k: int, P):
    Q = (0, 1, 1, 0)
    while k:
        if k & 1:
            Q = _ed_add(Q, P)
        P = _ed_add(P, P)
        k >>= 1
    return Q


def _compress(P) -> bytes:
    x, y, z, _ = P
    zinv = pow(z, -1, _P)
    x, y = x * zinv % _P, y * zinv % _P
    return ((y | ((x & 1) << 255)).to_bytes(32, "little"))


def _decompress(data: bytes):
    if len(data) != 32:
        return None
    y = int.from_bytes(data, "little")
    sign = y >> 255
    y &= (1 << 255) - 1
    if y >= _P:
        return None
    x = _recover_x(y, sign)
    if x is None:
        return None
    return (x, y, 1, x * y % _P)


def _sha512(*parts: bytes) -> int:
    h = hashlib.sha512()
    for part in parts:
        h.update(part)
    return int.from_bytes(h.digest(), "little")


@dataclasses.dataclass(frozen=True)
class Ed25519Keypair:
    secret: bytes  # 32-byte seed
    public: bytes  # 32-byte compressed point


def generate_key(rng) -> Ed25519Keypair:
    seed = bytes(rng.randrange(256) for _ in range(32))
    return keypair_from_seed(seed)


def keypair_from_seed(seed: bytes) -> Ed25519Keypair:
    h = hashlib.sha512(seed).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    A = _compress(_ed_mul(a, _B))
    return Ed25519Keypair(secret=seed, public=A)


def sign(keypair: Ed25519Keypair, message: bytes) -> bytes:
    h = hashlib.sha512(keypair.secret).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    prefix = h[32:]
    r = _sha512(prefix, message) % _L
    R = _compress(_ed_mul(r, _B))
    k = _sha512(R, keypair.public, message) % _L
    s = (r + k * a) % _L
    return R + s.to_bytes(32, "little")


def verify(public: bytes, message: bytes, signature: bytes) -> bool:
    if len(signature) != 64:
        return False
    A = _decompress(public)
    R = _decompress(signature[:32])
    if A is None or R is None:
        return False
    s = int.from_bytes(signature[32:], "little")
    if s >= _L:
        return False
    k = _sha512(signature[:32], public, message) % _L
    sB = _ed_mul(s, _B)
    kA = _ed_mul(k, A)
    RkA = _ed_add(R, kA)
    # compare projective points: sB == R + kA
    x1, y1, z1, _ = sB
    x2, y2, z2, _ = RkA
    return (
        (x1 * z2 - x2 * z1) % _P == 0 and (y1 * z2 - y2 * z1) % _P == 0
    )
