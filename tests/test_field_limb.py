"""Limb-decomposed field arithmetic vs the Python-int oracle."""

import random

import numpy as np
import pytest

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FR

FIELDS = [BN254_FR, BLS12_381_FR, BLS12_381_FQ]
RNG = random.Random(0xA11CE)


def sample_ints(spec, n):
    vals = [RNG.randrange(spec.modulus) for _ in range(n - 3)]
    return vals + [0, 1, spec.modulus - 1]


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_pack_roundtrip(spec):
    xs = sample_ints(spec, 16)
    packed = limb.pack(spec, xs)
    assert packed.shape == (spec.n_limbs, 16)
    assert [int(v) for v in limb.unpack(spec, packed)] == xs


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    xs = sample_ints(spec, 32)
    ys = list(reversed(xs))
    a, b = limb.pack(spec, xs), limb.pack(spec, ys)
    got_add = limb.unpack(spec, limb.add(spec, a, b))
    got_sub = limb.unpack(spec, limb.sub(spec, a, b))
    got_neg = limb.unpack(spec, limb.neg(spec, a))
    for x, y, ga, gs, gn in zip(xs, ys, got_add, got_sub, got_neg):
        assert int(ga) == (x + y) % spec.modulus
        assert int(gs) == (x - y) % spec.modulus
        assert int(gn) == (-x) % spec.modulus


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_mont_mul(spec):
    xs = sample_ints(spec, 32)
    ys = list(reversed(xs))
    a = limb.pack_mont(spec, xs)
    b = limb.pack_mont(spec, ys)
    got = limb.unpack_mont(spec, limb.mont_mul(spec, a, b))
    for x, y, g in zip(xs, ys, got):
        assert int(g) == x * y % spec.modulus


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_mont_conversions(spec):
    xs = sample_ints(spec, 8)
    a = limb.pack(spec, xs)
    m = limb.to_mont(spec, a)
    back = limb.unpack(spec, limb.from_mont(spec, m))
    assert [int(v) for v in back] == xs


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_pow5_pow_inv(spec):
    xs = sample_ints(spec, 8)
    a = limb.pack_mont(spec, xs)
    got5 = limb.unpack_mont(spec, limb.mont_pow5(spec, a))
    for x, g in zip(xs, got5):
        assert int(g) == pow(x, 5, spec.modulus)

    e = 0xDEADBEEFCAFE
    gote = limb.unpack_mont(spec, limb.mont_pow(spec, a, e))
    for x, g in zip(xs, gote):
        assert int(g) == pow(x, e, spec.modulus)

    gotinv = limb.unpack_mont(spec, limb.mont_inv(spec, a))
    for x, g in zip(xs, gotinv):
        assert int(g) == (pow(x, -1, spec.modulus) if x else 0)


@pytest.mark.parametrize("spec", [BN254_FR], ids=lambda s: s.name)
def test_broadcasting_and_select(spec):
    xs = sample_ints(spec, 8)
    a = limb.pack_mont(spec, np.array(xs, dtype=object).reshape(2, 4))
    one = limb.pack_mont(spec, 1).reshape(spec.n_limbs, 1, 1)
    got = limb.unpack_mont(spec, limb.mont_mul(spec, a, one))
    assert [int(v) for v in got.ravel()] == xs

    mask = limb.is_zero(limb.sub(spec, a, a))
    assert bool(mask.all())
    sel = limb.select(mask, a, limb.zeros(spec, (2, 4)))
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(a))
