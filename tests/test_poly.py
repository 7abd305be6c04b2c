"""DensePoly / Radix2Domain (the ark-poly user surface over ops/ntt.py)."""

import random

import pytest

from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops import poly as polymod
from openzl_tpu.ops.poly import DensePoly, Radix2Domain

RNG = random.Random(0x901)


@pytest.fixture(params=["bls381", "bn254"])
def spec(request):
    return BLS12_381_FR if request.param == "bls381" else BN254_FR


def test_poly_ring_axioms(spec):
    p = spec.modulus
    a = DensePoly.rand(spec, 7, RNG)
    b = DensePoly.rand(spec, 5, RNG)
    c = DensePoly.rand(spec, 6, RNG)
    assert a + b == b + a
    assert (a + b) + c == a + (b + c)
    assert a - a == DensePoly.zero(spec)
    assert a * b == b * a
    assert a * (b + c) == a * b + a * c
    assert (a * b).degree == a.degree + b.degree
    k = RNG.randrange(p)
    z = RNG.randrange(p)
    assert a.scale(k).evaluate(z) == k * a.evaluate(z) % p
    assert (a * b).evaluate(z) == a.evaluate(z) * b.evaluate(z) % p


def test_poly_schoolbook_vs_ntt_product(spec, monkeypatch):
    """The device NTT product path must agree with host schoolbook."""
    a = DensePoly.rand(spec, 40, RNG)
    b = DensePoly.rand(spec, 23, RNG)
    want = a * b  # schoolbook (64 coeffs < _NTT_MUL_MIN)
    monkeypatch.setattr(polymod, "_NTT_MUL_MIN", 8)
    got = a * b  # NTT path at domain 64
    assert got == want


def test_poly_division(spec):
    a = DensePoly.rand(spec, 11, RNG)
    d = DensePoly.rand(spec, 4, RNG)
    q, r = a.divide_with_q_and_r(d)
    assert q * d + r == a
    assert r.degree < d.degree
    # exact division round trip
    q2, r2 = (a * d).divide_with_q_and_r(d)
    assert r2.is_zero() and q2 == a


def test_poly_vanishing_division(spec):
    dom = Radix2Domain.new(spec, 8)
    a = DensePoly.rand(spec, 20, RNG)
    q, r = a.divide_by_vanishing_poly(dom)
    z_h = DensePoly(spec, [-1] + [0] * (dom.size - 1) + [1])  # x^n - 1
    assert q * z_h + r == a
    assert r.degree < dom.size
    # a poly that IS divisible: remainder must vanish
    b = DensePoly.rand(spec, 6, RNG)
    q2, r2 = (b * z_h).divide_by_vanishing_poly(dom)
    assert r2.is_zero() and q2 == b
    # vanishing evaluation agrees with the dense form
    z = RNG.randrange(spec.modulus)
    assert dom.evaluate_vanishing(z) == z_h.evaluate(z)


def test_poly_vanishing_division_device(spec):
    """The device suffix-sum vanishing divide must match the host fold
    bit-exactly, including non-multiple-of-n lengths and multi-chunk
    quotients (len > 2n)."""
    dom = Radix2Domain.new(spec, 16)
    for deg in (16, 17, 31, 40, 63, 70):
        a = DensePoly.rand(spec, deg, RNG)
        qh, rh = a.divide_by_vanishing_poly(dom, device=False)
        qd, rd = a.divide_by_vanishing_poly(dom, device=True)
        assert qd == qh and rd == rh, deg
    # degenerate: len <= n is identity regardless of path selection
    small = DensePoly.rand(spec, 7, RNG)
    q, r = small.divide_by_vanishing_poly(dom, device=True)
    assert q.is_zero() and r == small


def test_domain_size_one(spec):
    """ark-poly's Radix2EvaluationDomain supports size 1; the domain is
    {1}, all transforms are the identity (ADVICE r4 low — `new` used to
    force log_n >= 1)."""
    dom = Radix2Domain.new(spec, 1)
    assert dom.size == 1 and dom.log_n == 0
    assert dom.group_gen == 1
    assert dom.elements() == [1]
    z = RNG.randrange(spec.modulus)
    assert dom.evaluate_vanishing(z) == (z - 1) % spec.modulus
    assert dom.lagrange_coeffs(z) == [1]  # L_0 = 1 everywhere
    c = RNG.randrange(spec.modulus)
    assert dom.fft([c]) == [c]
    assert dom.ifft([c]) == [c]
    assert dom.coset_fft([c]) == [c]
    assert dom.coset_ifft([c]) == [c]
    a = DensePoly(spec, [c])
    assert DensePoly.from_evals(dom, dom.fft(a.coeffs)) == a


def test_domain_fft_interpolation(spec):
    dom = Radix2Domain.new(spec, 16)
    assert dom.size == 16
    a = DensePoly.rand(spec, 11, RNG)
    evals = dom.fft(a.coeffs)
    # fft really evaluates on the subgroup elements
    for e, x in zip(evals, dom.elements()):
        assert e == a.evaluate(x)
    assert DensePoly.from_evals(dom, evals) == a
    # coset round trip + coset evaluation semantics
    cevals = dom.coset_fft(a.coeffs)
    g = polymod.nttmod.GENERATORS[spec.name]
    p = spec.modulus
    for ce, x in zip(cevals, dom.elements()):
        assert ce == a.evaluate(g * x % p)
    assert DensePoly(spec, dom.coset_ifft(cevals)) == a


def test_domain_lagrange_coeffs(spec):
    p = spec.modulus
    dom = Radix2Domain.new(spec, 8)
    a = DensePoly.rand(spec, 7, RNG)
    evals = dom.fft(a.coeffs)
    z = RNG.randrange(p)
    ls = dom.lagrange_coeffs(z)
    assert sum(l * e for l, e in zip(ls, evals)) % p == a.evaluate(z)
    # on-domain point: indicator vector
    w3 = dom.elements()[3]
    ls3 = dom.lagrange_coeffs(w3)
    assert ls3[3] == 1 and sum(ls3) == 1
