"""BW6-761: the outer curve of the BLS12-377 2-chain (reference curve
matrix `bw6_761`, plugins/arkworks/Cargo.toml:54-58).

The parameters are re-DERIVED here (not copied — the ark crate is not in
this environment) from the BLS12-377 seed via the Brezing-Weng construction
(ht = 13, hy = 9), and the pairing is validated by bilinearity — any
bilinear non-degenerate pairing verifies the same Groth16 equations.
"""

import random

import pytest

from openzl_tpu.curves.spec import BW6_761_G1, BW6_761_G2
from openzl_tpu.ref import curve as refc
from openzl_tpu.ref import pairing6

RNG = random.Random(0xB76)
SPEC = pairing6.BW6_761


def _sqrt_mod(a, p):
    a %= p
    assert p % 4 == 3
    r = pow(a, (p + 1) // 4, p)
    return r if r * r % p == a else None


def test_bw6_761_derivation():
    """Re-derive q from the BLS12-377 seed and check every stored constant:
    q prime (Miller-Rabin), r | q + 1 - t, cofactors exact, -4 a sextic
    non-residue, both curve orders r-divisible."""
    x = 0x8508C00000000001
    r = ((x - 1) ** 2 * (x**4 - x**2 + 1)) // 3 + x
    assert r == BW6_761_G1.scalar.modulus  # = BLS12-377 Fq
    t0 = x**5 - 3 * x**4 + 3 * x**3 - x + 3
    t = t0 + 13 * r
    assert SPEC.ate_loop == t - 1
    # y0 = (t0 - 2) sqrt(-1/3) mod r; r = 3 mod 4 is False (two-adicity 46)
    # so use the CM identity directly: (t-2)^2 + 3 y^2 = 4 (q + 1 - t)
    q = BW6_761_G1.base.modulus
    assert q.bit_length() == 761
    n1 = q + 1 - t
    assert n1 % r == 0 and n1 // r == BW6_761_G1.cofactor
    y2_3 = 4 * q - t * t
    assert y2_3 % 3 == 0
    y2 = y2_3 // 3
    y = _isqrt(y2)
    assert y * y == y2, "CM equation 4q = t^2 + 3y^2 must hold exactly"
    assert (y - 9 * r) % r == (t0 - 2) * _sqrt_mod_general(
        (-pow(3, -1, r)) % r, r
    ) % r or (y - 9 * r) % r == (
        -(t0 - 2) * _sqrt_mod_general((-pow(3, -1, r)) % r, r)
    ) % r
    # q prime (deterministic enough Miller-Rabin)
    assert _is_prime(q)
    # -4 must be a sextic non-residue: neither square nor cube
    nr = (-4) % q
    assert pow(nr, (q - 1) // 2, q) != 1
    assert pow(nr, (q - 1) // 3, q) != 1
    # twist cofactor: #E' = q + 1 - t' for the matched sextic twist trace
    n2 = BW6_761_G2.cofactor * r
    t2 = q + 1 - n2
    assert t2 in (t, -t, (t + 3 * y) // 2, (t - 3 * y) // 2,
                  (-(t + 3 * y)) // 2, (-(t - 3 * y)) // 2)


def _isqrt(n):
    import math

    return math.isqrt(n)


def _sqrt_mod_general(a, p):
    """Tonelli-Shanks (r = 1 mod 2^46 needs the general path)."""
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    q_, s = p - 1, 0
    while q_ % 2 == 0:
        q_ //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q_, p), pow(a, q_, p), pow(a, (q_ + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def _is_prime(n, k=32):
    rng = random.Random(0x9E3779B9)
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for _ in range(k):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def test_bw6_761_generators_on_curve_with_order_r():
    for curve in (BW6_761_G1, BW6_761_G2):
        G = refc.generator(curve)
        assert curve.is_on_curve_int(*G)
        assert refc.scalar_mul(curve, curve.scalar.modulus, G) is None
        assert refc.scalar_mul(curve, 1, G) == G


def test_bw6_761_pairing_bilinear():
    G1 = refc.generator(BW6_761_G1)
    G2 = refc.generator(BW6_761_G2)
    e = pairing6.pairing(SPEC, G1, G2)
    assert e != pairing6.f6_one(), "pairing must be non-degenerate"
    a = RNG.randrange(1, 1 << 64)
    b = RNG.randrange(1, 1 << 64)
    aP = refc.scalar_mul(BW6_761_G1, a, G1)
    bQ = refc.scalar_mul(BW6_761_G2, b, G2)
    lhs = pairing6.pairing(SPEC, aP, bQ)
    rhs = pairing6.f6_pow(SPEC.p, SPEC.nr, e, a * b % SPEC.r)
    assert lhs == rhs
    # product shape: e(aP, Q) e(-aP, Q) == 1
    assert pairing6.pairing_product_is_one(
        SPEC, [(aP, G2), (refc.neg(BW6_761_G1, aP), G2)]
    )
    assert not pairing6.pairing_product_is_one(SPEC, [(aP, bQ), (G1, G2)])


@pytest.mark.heavy
def test_bw6_761_groth16_roundtrip():
    """Groth16 over the outer curve (host backend — verify-side composition
    workloads are tiny circuits; the device path needs no curve-specific
    code but 48-limb compiles belong in benches, not CI)."""
    from openzl_tpu.proof_systems import Groth16

    g16 = Groth16(SPEC, backend="host")

    def build(com, x=None, y=None):
        yv = com.public_input(y)
        xv = com.secret_witness(x)
        com.assert_eq(com.mul(com.mul(xv, xv), xv), yv)
        return com

    p = g16.fr.modulus
    xval = RNG.randrange(p)
    yval = pow(xval, 3, p)
    pk = g16.compile(build(g16.context_compiler()).cs, RNG)
    proof = g16.prove(pk, build(g16.proof_compiler(), xval, yval).cs, RNG)
    assert g16.verify(pk.vk, [yval], proof)
    assert not g16.verify(pk.vk, [(yval + 1) % p], proof)
