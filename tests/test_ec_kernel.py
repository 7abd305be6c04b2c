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
