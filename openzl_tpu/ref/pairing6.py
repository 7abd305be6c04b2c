"""Ate pairing for embedding-degree-6 curves (BW6-761) — host O(1) path.

Completes the reference's 2-chain curve matrix (plugins/arkworks/Cargo.toml
ark-bw6-761 feature, Cargo.toml:54-58): BW6-761's scalar field is
BLS12-377's base field, so Groth16 over BW6-761 can verify BLS12-377
pairings in-circuit (one-layer proof composition).

Same deliberately-simple construction as `ref.pairing` (the k=12 engine):

  * Fq6 is the DIRECT quotient Fq[z]/(z^6 - nr) (nr = -4 for BW6-761; -4 is
    neither a square nor a cube mod q, verified in tests). Elements are
    6-tuples of ints, multiplication is schoolbook polynomial product with
    z^6 -> nr folding, inversion is extended Euclid over Fq[z].
  * G2 lives on the sextic M-twist E'/Fq: y^2 = x^3 + b*nr; untwist
    (x, y) -> (x z^-2, y z^-3) lands on E(Fq6).
  * Miller loop length T = t - 1 (the classic ate pairing; T ~ 381 bits
    since t = t0 + 13 r), final exponentiation directly to (q^6 - 1)/r.

Bilinearity/non-degeneracy are proven by construction and re-checked in
tests/test_pairing_bw6.py; any bilinear non-degenerate pairing verifies the
same Groth16 equations, so the proof system composes unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

from ..curves.spec import BW6_761_G1, BW6_761_G2, CurveSpec

F6 = Tuple[int, int, int, int, int, int]


@dataclasses.dataclass(frozen=True)
class PairingSpec6:
    """Embedding-degree-6 pairing configuration (duck-types ref.pairing's
    PairingSpec surface used by Groth16: g1/g2/p/r)."""

    name: str
    g1: CurveSpec
    g2: CurveSpec
    nr: int  # Fq6 = Fq[z]/(z^6 - nr); twist b' = b * nr (M-type)
    ate_loop: int  # t - 1
    embedding_degree: int = 6

    @property
    def p(self) -> int:
        return self.g1.base.modulus

    @property
    def r(self) -> int:
        return self.g1.scalar.modulus

    @functools.cached_property
    def final_exp(self) -> int:
        return (self.p**6 - 1) // self.r


def _bw6_trace() -> int:
    """t = t0 + 13 r from the Brezing-Weng derivation (ht = 13); see
    fields/spec.py BW6_761_FQ."""
    x = 0x8508C00000000001
    r = ((x - 1) ** 2 * (x**4 - x**2 + 1)) // 3 + x
    return x**5 - 3 * x**4 + 3 * x**3 - x + 3 + 13 * r


BW6_761 = PairingSpec6(
    name="bw6_761",
    g1=BW6_761_G1,
    g2=BW6_761_G2,
    nr=-4,
    ate_loop=_bw6_trace() - 1,
)


# ---------------------------------------------------------------------------
# Fq[z]/(z^6 - nr) arithmetic
# ---------------------------------------------------------------------------


def f6_one() -> F6:
    return (1, 0, 0, 0, 0, 0)


def f6_from(q: int, c: int) -> F6:
    return (c % q, 0, 0, 0, 0, 0)


def f6_add(q: int, a: F6, b: F6) -> F6:
    return tuple((x + y) % q for x, y in zip(a, b))


def f6_sub(q: int, a: F6, b: F6) -> F6:
    return tuple((x - y) % q for x, y in zip(a, b))


def f6_mul(q: int, nr: int, a: F6, b: F6) -> F6:
    out = [0] * 11
    for i, ai in enumerate(a):
        if not ai:
            continue
        for j, bj in enumerate(b):
            out[i + j] += ai * bj
    for k in range(10, 5, -1):
        out[k - 6] += out[k] * nr
    return tuple(v % q for v in out[:6])


def f6_sqr(q: int, nr: int, a: F6) -> F6:
    return f6_mul(q, nr, a, a)


def f6_inv(q: int, nr: int, a: F6) -> F6:
    """Extended Euclid over Fq[z] against the modulus m(z) = z^6 - nr."""

    def deg(p):
        for i in range(len(p) - 1, -1, -1):
            if p[i]:
                return i
        return -1

    a_, b_ = list(a), [(-nr) % q, 0, 0, 0, 0, 0, 1]
    u, v = [1], [0]  # invariant: u * a == a_  (mod m), v * a == b_ (mod m)
    while True:
        da, db = deg(a_), deg(b_)
        if da < 0:
            raise ZeroDivisionError("f6_inv of zero")
        if da == 0:
            c = pow(a_[0], -1, q)
            return tuple((ui * c) % q for ui in (u + [0] * 6)[:6])
        if da < db:
            a_, b_, u, v = b_, a_, v, u
            continue
        f = a_[da] * pow(b_[db], -1, q) % q
        sh = da - db
        for i in range(db + 1):
            a_[i + sh] = (a_[i + sh] - f * b_[i]) % q
        for i in range(len(v)):
            while len(u) < i + sh + 1:
                u.append(0)
            u[i + sh] = (u[i + sh] - f * v[i]) % q


def f6_pow(q: int, nr: int, a: F6, e: int) -> F6:
    acc = f6_one()
    for bit in bin(e)[2:]:
        acc = f6_sqr(q, nr, acc)
        if bit == "1":
            acc = f6_mul(q, nr, acc, a)
    return acc


# ---------------------------------------------------------------------------
# affine Miller loop in E(Fq6)
# ---------------------------------------------------------------------------


def _untwist(spec: PairingSpec6, Q: Tuple[int, int]) -> Tuple[F6, F6]:
    """E'(Fq) -> E(Fq6) for the M-twist: (x, y) -> (x z^-2, y z^-3)."""
    q, nr = spec.p, spec.nr
    zi2 = f6_inv(q, nr, (0, 0, 1, 0, 0, 0))
    zi3 = f6_inv(q, nr, (0, 0, 0, 1, 0, 0))
    return (
        f6_mul(q, nr, f6_from(q, Q[0]), zi2),
        f6_mul(q, nr, f6_from(q, Q[1]), zi3),
    )


def _lambda(spec: PairingSpec6, A, B) -> F6:
    q, nr = spec.p, spec.nr
    xa, ya = A
    xb, yb = B
    if xa == xb:
        num = f6_mul(q, nr, f6_from(q, 3), f6_sqr(q, nr, xa))
        den = f6_mul(q, nr, f6_from(q, 2), ya)
    else:
        num = f6_sub(q, yb, ya)
        den = f6_sub(q, xb, xa)
    return f6_mul(q, nr, num, f6_inv(q, nr, den))


def _line(spec: PairingSpec6, A, B, xp: F6, yp: F6) -> F6:
    q, nr = spec.p, spec.nr
    xa, ya = A
    if A[0] == B[0] and A[1] != B[1]:
        return f6_sub(q, xp, xa)  # vertical
    lam = _lambda(spec, A, B)
    return f6_sub(
        q, f6_sub(q, yp, ya), f6_mul(q, nr, lam, f6_sub(q, xp, xa))
    )


def _ec_add6(spec: PairingSpec6, A, B):
    q, nr = spec.p, spec.nr
    if A is None:
        return B
    if B is None:
        return A
    if A[0] == B[0] and A[1] != B[1]:
        return None
    lam = _lambda(spec, A, B)
    x3 = f6_sub(q, f6_sub(q, f6_sqr(q, nr, lam), A[0]), B[0])
    return (x3, f6_sub(q, f6_mul(q, nr, lam, f6_sub(q, A[0], x3)), A[1]))


def miller_loop(
    spec: PairingSpec6, P: Tuple[int, int], Q: Tuple[int, int]
) -> F6:
    """f_{T,Q}(P), T = ate_loop = t - 1."""
    q, nr = spec.p, spec.nr
    xp, yp = f6_from(q, P[0]), f6_from(q, P[1])
    Qt = _untwist(spec, Q)
    R = Qt
    f = f6_one()
    for bit in bin(spec.ate_loop)[3:]:
        f = f6_mul(q, nr, f6_sqr(q, nr, f), _line(spec, R, R, xp, yp))
        R = _ec_add6(spec, R, R)
        if bit == "1":
            f = f6_mul(q, nr, f, _line(spec, R, Qt, xp, yp))
            R = _ec_add6(spec, R, Qt)
    return f


def pairing(spec: PairingSpec6, P, Q) -> F6:
    """e(P, Q): P affine G1 | None; Q affine G2 (both int pairs over Fq)."""
    if P is None or Q is None:
        return f6_one()
    f = miller_loop(spec, P, Q)
    return f6_pow(spec.p, spec.nr, f, spec.final_exp)


def pairing_product_is_one(spec: PairingSpec6, pairs) -> bool:
    """prod e(P_i, Q_i) == 1 — one shared final exponentiation."""
    q, nr = spec.p, spec.nr
    acc = f6_one()
    for P, Q in pairs:
        if P is None or Q is None:
            continue
        acc = f6_mul(q, nr, acc, miller_loop(spec, P, Q))
    return f6_pow(q, nr, acc, spec.final_exp) == f6_one()
