"""KZG polynomial commitments: commit/open/verify round trips, batched
openings, params serialization, and the heavy device-MSM commit path
(the reference's poly-commit feature — plugins/arkworks/Cargo.toml:139-140)."""

import random

import pytest

from openzl_tpu.proof_systems import KZG, KZGParams
from openzl_tpu.ref import pairing as refpair

RNG = random.Random(0x6B7A67)


def _poly(r, deg):
    return [RNG.randrange(r) for _ in range(deg + 1)]


@pytest.fixture(scope="module")
def kzg_host():
    k = KZG(refpair.BN254, backend="host")
    params = k.setup(16, RNG)
    return k, params


def test_kzg_open_verify_roundtrip(kzg_host):
    k, params = kzg_host
    r = k.pairing.r
    coeffs = _poly(r, 12)
    C = k.commit(params, coeffs)
    z = RNG.randrange(r)
    v, w = k.open(params, coeffs, z)
    # the claimed evaluation really is p(z)
    want = 0
    for c in reversed(coeffs):
        want = (want * z + c) % r
    assert v == want
    assert k.verify(params, C, z, v, w)
    # wrong value / wrong point / wrong witness all rejected
    assert not k.verify(params, C, z, (v + 1) % r, w)
    assert not k.verify(params, C, (z + 1) % r, v, w)
    C2 = k.commit(params, _poly(r, 12))
    assert not k.verify(params, C2, z, v, w)


def test_kzg_constant_and_degree_bounds(kzg_host):
    k, params = kzg_host
    r = k.pairing.r
    c0 = RNG.randrange(r)
    C = k.commit(params, [c0])
    v, w = k.open(params, [c0], 5)
    assert v == c0 and w is None
    assert k.verify(params, C, 5, v, w)
    assert not k.verify(params, C, 5, (v + 1) % r, w)
    with pytest.raises(AssertionError):
        k.commit(params, _poly(r, params.max_degree + 1))


def test_kzg_zero_polynomial(kzg_host):
    """Empty coefficient list = zero polynomial: open must not IndexError
    (ADVICE r4 low) and the identity commitment verifies v = 0."""
    k, params = kzg_host
    v, w = k.open(params, [], 11)
    assert v == 0 and w is None
    C = k.commit(params, [])
    assert C is None
    assert k.verify(params, C, 11, 0, None)
    assert not k.verify(params, C, 11, 1, None)


class _FixedTau:
    """rng stub handing setup a KNOWN tau (test-only toxic waste)."""

    def __init__(self, tau):
        self.tau = tau

    def randrange(self, *a):
        return self.tau


def test_kzg_identity_lhs_degenerate_openings():
    """p(tau) == v edge cases (ADVICE r4 low): the honest opening where
    both C - vG and the witness are the identity must ACCEPT; a real
    (non-identity) witness against an identity lhs must reject."""
    k = KZG(refpair.BN254, backend="host")
    r = k.pairing.r
    tau = 0x1234567
    params = k.setup(8, _FixedTau(tau))
    z, c = 5, 99
    # p(x) = (x - z)(x - tau) + c: p(z) = c = p(tau), q = (x - tau)
    coeffs = [
        (z * tau + c) % r,
        (-(z + tau)) % r,
        1,
    ]
    C = k.commit(params, coeffs)  # [p(tau)]G = [c]G, so C - vG is identity
    v, w = k.open(params, coeffs, z)
    assert v == c
    assert w is None  # q(tau) = 0 -> identity witness
    assert k.verify(params, C, z, v, w)
    # same claim with a REAL witness point must reject (lhs identity, rhs not)
    fake_w = k.commit(params, [0, 1])  # [tau]G, a non-identity point
    assert not k.verify(params, C, z, v, fake_w)


def test_kzg_batch_verify(kzg_host):
    k, params = kzg_host
    r = k.pairing.r
    z = RNG.randrange(r)
    claims = []
    for _ in range(3):
        coeffs = _poly(r, 10)
        C = k.commit(params, coeffs)
        v, w = k.open(params, coeffs, z)
        claims.append((C, z, v, w))
    assert k.batch_verify(params, claims, RNG)
    # corrupt one claimed value: the whole batch must fail
    C, _, v, w = claims[1]
    claims[1] = (C, z, (v + 1) % r, w)
    assert not k.batch_verify(params, claims, RNG)


def test_kzg_batch_verify_distinct_points(kzg_host):
    """ark batch_check general form: one 2-pairing product over openings
    at pairwise-DISTINCT points (VERDICT r4 item 10)."""
    k, params = kzg_host
    r = k.pairing.r
    claims = []
    for j in range(4):
        coeffs = _poly(r, 9 + j)
        C = k.commit(params, coeffs)
        z = RNG.randrange(r)
        v, w = k.open(params, coeffs, z)
        claims.append((C, z, v, w))
    assert len({z for _, z, _, _ in claims}) == 4
    assert k.batch_verify(params, claims, RNG)
    # corrupting any single component of any claim must fail the batch
    C, z, v, w = claims[2]
    assert not k.batch_verify(
        params, claims[:2] + [(C, z, (v + 1) % r, w)] + claims[3:], RNG
    )
    assert not k.batch_verify(
        params, claims[:2] + [(C, (z + 1) % r, v, w)] + claims[3:], RNG
    )
    bad_w = k.commit(params, _poly(r, 4))
    assert not k.batch_verify(
        params, claims[:2] + [(C, z, v, bad_w)] + claims[3:], RNG
    )
    # a swap of two claims' witnesses (each individually on-curve) fails
    (C0, z0, v0, w0), (C1, z1, v1, w1) = claims[0], claims[1]
    assert not k.batch_verify(
        params,
        [(C0, z0, v0, w1), (C1, z1, v1, w0)] + claims[2:],
        RNG,
    )


def test_kzg_batch_verify_degenerate_claims(kzg_host):
    """Identity-witness claims (constant polys) mix correctly into a
    distinct-point batch; an all-degenerate batch accepts iff honest."""
    k, params = kzg_host
    r = k.pairing.r
    c0, c1 = RNG.randrange(r), RNG.randrange(r)
    degenerate = [
        (k.commit(params, [c0]), 3, c0, None),
        (k.commit(params, [c1]), 7, c1, None),
    ]
    assert k.batch_verify(params, degenerate, RNG)
    assert not k.batch_verify(
        params, [degenerate[0], (degenerate[1][0], 7, (c1 + 1) % r, None)], RNG
    )
    coeffs = _poly(r, 6)
    C = k.commit(params, coeffs)
    z = RNG.randrange(r)
    v, w = k.open(params, coeffs, z)
    assert k.batch_verify(params, degenerate + [(C, z, v, w)], RNG)
    assert not k.batch_verify(
        params, degenerate + [(C, z, (v + 1) % r, w)], RNG
    )


def test_kzg_params_serialization(kzg_host):
    k, params = kzg_host
    r = k.pairing.r
    blob = params.to_bytes()
    params2 = KZGParams.from_bytes(k.pairing, blob)
    assert params2.host and params2.max_degree == params.max_degree
    coeffs = _poly(r, 8)
    assert k.commit(params2, coeffs) == k.commit(params, coeffs)
    lifted = k.device_params(params2)  # device lift (commit parity: heavy)
    assert not lifted.host


@pytest.mark.heavy
def test_kzg_device_commit_at_scale():
    """Device-backend commit/open on the TPU MSM pipeline at degree 511
    (full-width scalars), cross-checked against the host oracle."""
    k = KZG(refpair.BN254, backend="device")
    params = k.setup(511, random.Random(3))
    assert not params.host
    kh = KZG(refpair.BN254, backend="host")
    params_h = KZGParams.from_bytes(k.pairing, params.to_bytes())
    r = k.pairing.r
    coeffs = _poly(r, 511)
    C = k.commit(params, coeffs)
    assert C == kh.commit(params_h, coeffs)
    z = RNG.randrange(r)
    v, w = k.open(params, coeffs, z)
    vh, wh = kh.open(params_h, coeffs, z)
    assert (v, w) == (vh, wh)
    assert k.verify(params, C, z, v, w)
    assert not k.verify(params, C, z, (v + 1) % r, w)
