"""NTT/iNTT vs naive DFT oracle + ark-poly domain-convention anchors."""

import random

import numpy as np
import pytest

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_377_FR, BLS12_381_FR, BN254_FR
from openzl_tpu.ops import ntt as nttmod

RNG = random.Random(0x1717)


def naive_dft(spec, coeffs, w, offset=1):
    """Evaluate sum c_i x^i at offset*w^j for j in range(n)."""
    p = spec.modulus
    n = len(coeffs)
    outs = []
    for j in range(n):
        x = offset * pow(w, j, p) % p
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        outs.append(acc)
    return outs


@pytest.mark.parametrize(
    "spec", [BN254_FR, BLS12_381_FR, BLS12_377_FR], ids=lambda s: s.name
)
def test_group_gen_properties(spec):
    for log_n in (1, 4, 10):
        n = 1 << log_n
        w = nttmod.group_gen(spec, log_n)
        assert pow(w, n, spec.modulus) == 1
        assert pow(w, n // 2, spec.modulus) == spec.modulus - 1 or n == 1


@pytest.mark.parametrize(
    "spec", [BN254_FR, BLS12_381_FR, BLS12_377_FR], ids=lambda s: s.name
)
def test_ntt_matches_naive_dft(spec):
    log_n = 4
    n = 1 << log_n
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    w = nttmod.group_gen(spec, log_n)
    want = naive_dft(spec, coeffs, w)

    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    got = limb.unpack_mont(spec, np.asarray(nttmod.ntt(spec, x)))
    assert [int(v) for v in got] == want


def test_intt_roundtrip():
    spec = BLS12_381_FR
    n = 1 << 8
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    back = limb.unpack_mont(spec, np.asarray(nttmod.intt(spec, nttmod.ntt(spec, x))))
    assert [int(v) for v in back] == coeffs


def test_coset_ntt_matches_naive():
    spec = BLS12_381_FR
    log_n = 3
    n = 1 << log_n
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    w = nttmod.group_gen(spec, log_n)
    g = nttmod.GENERATORS[spec.name]
    want = naive_dft(spec, coeffs, w, offset=g)
    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    got = limb.unpack_mont(spec, np.asarray(nttmod.coset_ntt(spec, x)))
    assert [int(v) for v in got] == want
    back = limb.unpack_mont(
        spec, np.asarray(nttmod.coset_intt(spec, nttmod.coset_ntt(spec, x)))
    )
    assert [int(v) for v in back] == coeffs


def test_polynomial_multiplication_via_ntt():
    """Convolution theorem: the NTT path Groth16 uses for H(x)."""
    spec = BN254_FR
    p = spec.modulus
    n = 16
    a = [RNG.randrange(p) for _ in range(n // 2)] + [0] * (n // 2)
    b = [RNG.randrange(p) for _ in range(n // 2)] + [0] * (n // 2)
    want = [0] * n
    for i in range(n // 2):
        for j in range(n // 2):
            want[i + j] = (want[i + j] + a[i] * b[j]) % p

    fa = nttmod.ntt(spec, limb.pack_mont(spec, np.array(a, dtype=object)))
    fb = nttmod.ntt(spec, limb.pack_mont(spec, np.array(b, dtype=object)))
    prod = limb.mont_mul(spec, fa, fb)
    got = limb.unpack_mont(spec, np.asarray(nttmod.intt(spec, prod)))
    assert [int(v) for v in got] == want
