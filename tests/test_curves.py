"""Batched Jacobian curve ops (G1 over Fq, G2 over Fq2) vs the Python oracle."""

import random

import numpy as np
import pytest

from openzl_tpu.curves import (
    BLS12_377_G1,
    BLS12_377_G2,
    BLS12_381_G1,
    BLS12_381_G2,
    BN254_G1,
    BN254_G2,
)
from openzl_tpu.curves import jacobian as jac
from openzl_tpu.fields import limb
from openzl_tpu.ref import curve as ref

RNG = random.Random(0xC0C0)
CURVES = [BN254_G1, BLS12_381_G1, BN254_G2, BLS12_381_G2, BLS12_377_G1]
# BLS12-377 G2 (24-limb Fq2, beta=-5) compiles for minutes on the CPU
# backend, so only its heavy oracle tests include it
CURVES_ALL = CURVES + [BLS12_377_G2]


def rand_points(curve, n):
    return [ref.random_point(curve, RNG) for _ in range(n)]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_on_curve(curve):
    assert ref.is_on_curve(curve, ref.generator(curve))
    G = jac.generator(curve, (1,))
    assert bool(np.asarray(jac.is_on_curve(curve, G))[0])


@pytest.mark.heavy
@pytest.mark.parametrize("curve", CURVES_ALL, ids=lambda c: c.name)
def test_add_double_vs_oracle(curve):
    pts = rand_points(curve, 4)
    qts = rand_points(curve, 4)
    # include special cases: identity, equal points, inverse pair
    pts += [None, pts[0], pts[1]]
    qts += [qts[0], pts[0], ref.neg(curve, pts[1])]
    P = jac.from_affine_ints(curve, pts)
    Q = jac.from_affine_ints(curve, qts)

    got_add = jac.to_affine_ints(curve, jac.add(curve, P, Q))
    got_dbl = jac.to_affine_ints(curve, jac.double(curve, P))
    for i, (p, q) in enumerate(zip(pts, qts)):
        assert got_add[i] == ref.add(curve, p, q), f"add lane {i}"
        assert got_dbl[i] == ref.add(curve, p, p), f"dbl lane {i}"


@pytest.mark.heavy
@pytest.mark.parametrize("curve", [BN254_G1, BLS12_381_G2], ids=lambda c: c.name)
def test_scalar_mul_vs_oracle(curve):
    pts = rand_points(curve, 3)
    ks = [RNG.randrange(curve.scalar.modulus) for _ in range(2)] + [0]
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    got = jac.to_affine_ints(curve, jac.scalar_mul(curve, scal, P))
    for i, (k, p) in enumerate(zip(ks, pts)):
        assert got[i] == ref.scalar_mul(curve, k, p), f"lane {i}"


@pytest.mark.heavy
def test_scalar_mul_group_order():
    curve = BN254_G1
    P = jac.generator(curve, (1,))
    order = limb.pack(curve.scalar, np.array([0], dtype=object))
    # r * G: r = 0 mod r -> identity
    got = jac.to_affine_ints(curve, jac.scalar_mul(curve, order, P))
    assert got == [None]
