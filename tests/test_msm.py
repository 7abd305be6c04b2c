"""Pippenger MSM vs the Python-int oracle (G1 and G2)."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from openzl_tpu.curves import BLS12_381_G1, BN254_G1, BN254_G2
from openzl_tpu.curves import jacobian as jac
from openzl_tpu.fields import limb
from openzl_tpu.ops.msm import msm
from openzl_tpu.ref import curve as ref

RNG = random.Random(0x4453)


def run_msm(curve, ks, pts, window_bits, n_bits=None):
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    return jac.to_affine_ints(curve, msm(curve, scal, P, window_bits, n_bits))


@pytest.mark.parametrize(
    "curve", [BN254_G1, BLS12_381_G1, BN254_G2], ids=lambda c: c.name
)
def test_msm_short_scalars_vs_oracle(curve):
    """Short scalars (n_bits=32) keep the window count and compile small."""
    n = 24
    pts = [ref.random_point(curve, RNG) for _ in range(n)]
    ks = [RNG.randrange(1 << 32) for _ in range(n - 2)] + [0, 1]
    want = ref.msm(curve, ks, pts)
    assert run_msm(curve, ks, pts, 4, 32) == want


def test_msm_full_width_vs_oracle():
    curve = BN254_G1
    n = 32
    pts = [ref.random_point(curve, RNG) for _ in range(n)]
    ks = [RNG.randrange(curve.scalar.modulus) for _ in range(n)]
    want = ref.msm(curve, ks, pts)
    assert run_msm(curve, ks, pts, 16) == want


def test_msm_duplicate_digits_and_identity_points():
    curve = BN254_G1
    n = 16
    base = ref.random_point(curve, RNG)
    pts = [base] * (n - 1) + [None]
    ks = [5] * (n - 1) + [7]
    want = ref.msm(curve, ks, pts)
    assert run_msm(curve, ks, pts, 4, 16) == want
