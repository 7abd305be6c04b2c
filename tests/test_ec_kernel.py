"""Pallas EC kernels vs the jnp Jacobian path (interpret mode, toy curve).

The Mosaic-compiled kernels only run on real TPU (tools/verify_ec_kernel.py
drives them there); interpret mode executes the identical kernel trace on
CPU, which pins down the limb arithmetic and all special-case masks. The
2-limb toy curve keeps the interpret-mode graphs small.
"""

import random

import numpy as np
import pytest

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import toy_curve
from openzl_tpu.ops import ec_kernel
from openzl_tpu.ref import curve as ref

RNG = random.Random(0xEC0)


@pytest.fixture(scope="module")
def curve():
    return toy_curve()


def _pairs(curve, n):
    pts = [ref.random_point(curve, RNG) for _ in range(n)]
    qts = [ref.random_point(curve, RNG) for _ in range(n)]
    # exercise every mask: identities both sides, double, inverse pair
    pts[0] = None
    qts[1] = None
    qts[2] = pts[2]
    qts[3] = (pts[3][0], curve.base.modulus - pts[3][1])
    return pts, qts


def test_kernel_add_matches_jnp(curve):
    pts, qts = _pairs(curve, 8)
    P = jac.from_affine_ints(curve, pts)
    Q = jac.from_affine_ints(curve, qts)
    got = jac.JPoint(
        *ec_kernel.ec_op(
            curve.base, "add", P.x, P.y, P.z, Q.x, Q.y, Q.z, interpret=True
        )
    )
    want = [ref.add(curve, a, b) for a, b in zip(pts, qts)]
    assert jac.to_affine_ints(curve, got) == want


def test_kernel_madd_matches_jnp(curve):
    pts, qts = _pairs(curve, 8)
    P = jac.from_affine_ints(curve, pts)
    Q = jac.from_affine_ints(curve, qts)  # affine lift: Z in {0,1} already
    got = jac.JPoint(
        *ec_kernel.ec_op(
            curve.base, "madd", P.x, P.y, P.z, Q.x, Q.y, Q.z, interpret=True
        )
    )
    want = [ref.add(curve, a, b) for a, b in zip(pts, qts)]
    assert jac.to_affine_ints(curve, got) == want


def test_kernel_double_matches_jnp(curve):
    pts = [ref.random_point(curve, RNG) for _ in range(7)] + [None]
    P = jac.from_affine_ints(curve, pts)
    got = jac.JPoint(
        *ec_kernel.ec_op(curve.base, "dbl", P.x, P.y, P.z, interpret=True)
    )
    want = [ref.add(curve, a, a) for a in pts]
    assert jac.to_affine_ints(curve, got) == want


# ---------------------------------------------------------------------------
# G2 (Fq2) kernels: interpret mode vs the jnp Jacobian path
# ---------------------------------------------------------------------------
#
# The add/double formulas are rational functions plus Z/H/r masks — they
# never reference the curve's b — so equivalence can be checked on
# arbitrary Fq2 coordinate batches; curve-valid G2 runs happen on real TPU
# (tools/verify_ec_kernel.py) and in the MSM e2e tests.

import dataclasses

import jax.numpy as jnp

from openzl_tpu.fields import limb


@pytest.fixture(scope="module")
def curve2():
    c = toy_curve()
    return dataclasses.replace(c, name="toy_g2", ext=2)


def _rand_fq2(spec, b, rng):
    vals = np.array(
        [[rng.randrange(spec.modulus) for _ in range(b)] for _ in range(2)],
        dtype=object,
    )
    return jnp.asarray(limb.pack_mont(spec, vals))


def _g2_cases(curve2, b):
    spec = curve2.base
    rng = RNG
    X1, Y1, Z1 = (_rand_fq2(spec, b, rng) for _ in range(3))
    X2, Y2, Z2 = (_rand_fq2(spec, b, rng) for _ in range(3))
    # masks: P identity, Q identity, P == Q (double), P == -Q (opposite)
    Z1 = Z1.at[:, :, 0].set(0)
    Z2 = Z2.at[:, :, 1].set(0)
    X2 = X2.at[:, :, 2].set(X1[:, :, 2])
    Y2 = Y2.at[:, :, 2].set(Y1[:, :, 2])
    Z2 = Z2.at[:, :, 2].set(Z1[:, :, 2])
    X2 = X2.at[:, :, 3].set(X1[:, :, 3])
    neg = limb.neg(spec, Y1[:, :, 3])
    Y2 = Y2.at[:, :, 3].set(neg)
    Z2 = Z2.at[:, :, 3].set(Z1[:, :, 3])
    return jac.JPoint(X1, Y1, Z1), jac.JPoint(X2, Y2, Z2)


def _assert_same_points(got, want):
    """Non-identity outputs come from identical formulas -> bit-equal;
    identities may differ in their (ignored) X/Y representation (the
    kernel writes plain 1, the jnp path Montgomery 1)."""
    gz, wz = np.asarray(got[2]), np.asarray(want[2])
    assert ((gz == 0).all(axis=(0, 1)) == (wz == 0).all(axis=(0, 1))).all()
    live = ~(wz == 0).all(axis=(0, 1))
    for g, w in zip(got, want):
        assert (np.asarray(g)[:, :, live] == np.asarray(w)[:, :, live]).all()


def test_g2_kernel_add_matches_jnp(curve2):
    P, Q = _g2_cases(curve2, 6)
    got = ec_kernel.ec_op(
        curve2.base, "add", P.x, P.y, P.z, Q.x, Q.y, Q.z, ext=2,
        interpret=True,
    )
    want = jac.add(curve2, P, Q)
    _assert_same_points(got, want)


def test_g2_kernel_madd_matches_jnp(curve2):
    spec = curve2.base
    P, Q = _g2_cases(curve2, 6)
    # madd requires normalized Q: Z2 in {(0,0), (1,0)} (Montgomery one)
    b = Q.z.shape[-1]
    one = jnp.asarray(limb.pack_mont(spec, np.array([[1] * b, [0] * b], dtype=object)))
    is_id = jnp.all(Q.z == 0, axis=(0, 1))
    z2 = jnp.where(is_id[None, None, :], jnp.zeros_like(one), one)
    Q = jac.JPoint(Q.x, Q.y, z2)
    got = ec_kernel.ec_op(
        curve2.base, "madd", P.x, P.y, P.z, Q.x, Q.y, Q.z, ext=2,
        interpret=True,
    )
    want = jac.madd(curve2, P, Q)
    _assert_same_points(got, want)


def test_g2_kernel_double_matches_jnp(curve2):
    P, _ = _g2_cases(curve2, 6)
    got = ec_kernel.ec_op(
        curve2.base, "dbl", P.x, P.y, P.z, ext=2, interpret=True
    )
    want = jac.double(curve2, P)
    _assert_same_points(got, want)
