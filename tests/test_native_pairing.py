"""Native C++ pairing engine (native/pairing.cpp) vs the Python oracle.

The native path implements the same classic-ate construction as
openzl_tpu.ref.pairing (untwist to E(Fp12), affine Miller, loop t-1) with a
staged final exponentiation; these tests pin it to the oracle on all three
pairing families and to the algebra (bilinearity products).
"""

import random

import pytest

from openzl_tpu import native
from openzl_tpu.ref import curve as rc
from openzl_tpu.ref import pairing as rp

RNG = random.Random(0xA17E)

SPECS = [rp.BN254, rp.BLS12_381, rp.BLS12_377]

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_bilinearity_product(spec):
    g1, g2 = spec.g1, spec.g2
    a = RNG.randrange(2, spec.r)
    b = RNG.randrange(2, spec.r)
    P = rc.scalar_mul(g1, a, rc.generator(g1))
    Q = rc.scalar_mul(g2, b, rc.generator(g2))
    nabP = rc.neg(g1, rc.scalar_mul(g1, a * b % spec.r, rc.generator(g1)))
    good = [(P, Q), (nabP, rc.generator(g2))]
    bad = [(P, Q), (P, rc.generator(g2))]
    assert native.pairing_product_is_one(spec, good) is True
    assert native.pairing_product_is_one(spec, bad) is False


@pytest.mark.parametrize("spec", [rp.BN254], ids=lambda s: s.name)
def test_matches_python_oracle(spec):
    """Same verdicts as the pure-Python path on a 4-pair Groth16-shaped
    product (the oracle itself is bilinearity-tested in test_pairing.py)."""
    g1, g2 = spec.g1, spec.g2
    pairs = []
    total = 0
    ks = []
    for _ in range(3):
        a = RNG.randrange(2, spec.r)
        b = RNG.randrange(2, spec.r)
        ks.append((a, b))
        total = (total + a * b) % spec.r
        pairs.append(
            (
                rc.scalar_mul(g1, a, rc.generator(g1)),
                rc.scalar_mul(g2, b, rc.generator(g2)),
            )
        )
    closing = (
        rc.neg(g1, rc.scalar_mul(g1, total, rc.generator(g1))),
        rc.generator(g2),
    )
    good = pairs + [closing]
    assert native.pairing_product_is_one(spec, good) is True
    # python fallback agrees
    p, xi, beta = spec.p, spec.xi, spec.beta
    import openzl_tpu.ref.fields as tf

    acc = tf.f12_one()
    for P, Q in good:
        acc = tf.f12_mul(p, xi, acc, rp.miller_loop(spec, P, Q), beta)
    assert tf.f12_pow(p, xi, acc, spec.final_exp, beta) == tf.f12_one()
    # flipping one pair breaks it in both engines
    bad = pairs + [(closing[0], rc.scalar_mul(g2, 2, rc.generator(g2)))]
    assert native.pairing_product_is_one(spec, bad) is False


def test_infinity_pairs_skipped():
    spec = rp.BN254
    assert rp.pairing_product_is_one(spec, [(None, rc.generator(spec.g2))])
