"""Pairing oracle: bilinearity, non-degeneracy, same-ratio, ratio proofs
(reference pairing.rs test:95-129, ratio.rs test:119-139)."""

import random

import pytest

from openzl_tpu.proof_systems.ratio import RatioProof
from openzl_tpu.ref import curve as rc
from openzl_tpu.ref import fields as tf
from openzl_tpu.ref import pairing as pr

RNG = random.Random(0xFA18)


@pytest.mark.parametrize(
    "spec", [pr.BN254, pr.BLS12_381, pr.BLS12_377], ids=lambda s: s.name
)
def test_bilinearity(spec):
    G1, G2 = rc.generator(spec.g1), rc.generator(spec.g2)
    a, b = RNG.randrange(1, 1 << 48), RNG.randrange(1, 1 << 48)
    e_ab = pr.pairing(
        spec, rc.scalar_mul(spec.g1, a, G1), rc.scalar_mul(spec.g2, b, G2)
    )
    base = pr.pairing(spec, G1, G2)
    assert e_ab == tf.f12_pow(spec.p, spec.xi, base, a * b, beta=spec.beta)
    assert base != tf.f12_one()  # non-degenerate


@pytest.mark.parametrize(
    "spec", [pr.BN254, pr.BLS12_381, pr.BLS12_377], ids=lambda s: s.name
)
def test_same_ratio_product(spec):
    """e(aP, Q) * e(-P, aQ) == 1 (reference assert_valid_pairing_ratio)."""
    G1, G2 = rc.generator(spec.g1), rc.generator(spec.g2)
    a = RNG.randrange(1, spec.r)
    assert pr.pairing_product_is_one(
        spec,
        [
            (rc.scalar_mul(spec.g1, a, G1), G2),
            (rc.neg(spec.g1, G1), rc.scalar_mul(spec.g2, a, G2)),
        ],
    )
    # and a mismatched ratio fails
    assert not pr.pairing_product_is_one(
        spec,
        [
            (rc.scalar_mul(spec.g1, a, G1), G2),
            (rc.neg(spec.g1, G1), rc.scalar_mul(spec.g2, a + 1, G2)),
        ],
    )


def test_ratio_proof_roundtrip():
    spec = pr.BN254
    scalar = RNG.randrange(1, spec.r)
    proof = RatioProof.prove(spec, b"ceremony-round-1", scalar, RNG)
    assert proof is not None
    assert proof.verify(spec, b"ceremony-round-1")
    assert not proof.verify(spec, b"ceremony-round-2")
