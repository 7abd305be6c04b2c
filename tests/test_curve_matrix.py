"""Wider curve-config matrix: Pasta cycle + embedded Edwards curves.

Mirrors the reference's curve feature matrix rows pallas / vesta /
ed_on_bls12_377 / ed_on_bls12_381 / ed_on_bn254
(plugins/arkworks/Cargo.toml:40-69). Host-oracle structural checks — the
batched device path is generic over CurveSpec/EdwardsSpec and covered by
the oracle tests in test_curves.py / test_ec_gadget.py.
"""

import random

import pytest

from openzl_tpu.curves import edwards
from openzl_tpu.curves.spec import PALLAS, VESTA, get_curve
from openzl_tpu.ref import curve as refc

RNG = random.Random(0x9A57A)


@pytest.mark.parametrize("curve", [PALLAS, VESTA], ids=lambda c: c.name)
def test_pasta_structure(curve):
    G = refc.generator(curve)
    assert refc.is_on_curve(curve, G)
    # prime-order curves: (r - 1) G + G = identity
    acc = refc.scalar_mul(curve, curve.scalar.modulus - 1, G)
    assert refc.add(curve, acc, G) is None
    assert curve.cofactor == 1


def test_pasta_cycle():
    """Each pasta curve's base field is the other's scalar field."""
    assert PALLAS.base is VESTA.scalar
    assert VESTA.base is PALLAS.scalar
    assert get_curve("pallas") is PALLAS


@pytest.mark.parametrize("curve", [PALLAS, VESTA], ids=lambda c: c.name)
def test_pasta_oracle_algebra(curve):
    G = refc.generator(curve)
    k1 = RNG.randrange(1, curve.scalar.modulus)
    k2 = RNG.randrange(1, curve.scalar.modulus)
    P = refc.scalar_mul(curve, k1, G)
    Q = refc.scalar_mul(curve, k2, G)
    assert refc.add(curve, P, Q) == refc.scalar_mul(
        curve, (k1 + k2) % curve.scalar.modulus, G
    )


@pytest.mark.parametrize("curve", [PALLAS, VESTA], ids=lambda c: c.name)
def test_pasta_codec_roundtrip(curve):
    from openzl_tpu.utils import codec

    P = refc.random_point(curve, RNG)
    data = codec.point_to_bytes(curve, P)
    assert codec.point_from_bytes(curve, data) == P


@pytest.mark.parametrize(
    "spec_fn",
    [edwards.jubjub, edwards.ed_on_bls12_377, lambda: edwards.BABY_JUBJUB],
    ids=["jubjub", "ed_on_bls12_377", "baby_jubjub"],
)
def test_edwards_matrix(spec_fn):
    spec = spec_fn()
    edwards.validate(spec)
    # complete addition law sanity: k1 G + k2 G == (k1 + k2) G
    k1 = RNG.randrange(1, spec.order)
    k2 = RNG.randrange(1, spec.order)
    lhs = edwards.add(
        spec,
        edwards.scalar_mul(spec, k1, spec.gen),
        edwards.scalar_mul(spec, k2, spec.gen),
    )
    assert lhs == edwards.scalar_mul(spec, (k1 + k2) % spec.order, spec.gen)


def test_ed_on_bls12_377_embeds():
    """Base field of the embedded curve = scalar field of BLS12-377 (the
    ScalarVar safety requirement, reference algebra.rs:28-52)."""
    from openzl_tpu.curves.spec import BLS12_377_G1

    spec = edwards.ed_on_bls12_377()
    assert spec.base is BLS12_377_G1.scalar
    assert spec.order < spec.base.modulus
