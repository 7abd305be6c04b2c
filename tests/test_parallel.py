"""Multi-chip sharded kernels on the 8-device virtual CPU mesh
(SURVEY.md section 4's added multi-chip strategy: shard the same vectors and
compare against the 1-chip results)."""

import random

import numpy as np
import pytest

import jax

from openzl_tpu.curves import BN254_G1
from openzl_tpu.curves import jacobian as jac
from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops import msm as msmmod
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.parallel import (
    local_mesh,
    sharded_msm,
    sharded_ntt,
    sharded_poseidon_hash,
)
from openzl_tpu.ref import curve as refc

RNG = random.Random(0x3A3A)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8
def test_sharded_poseidon_matches_single_chip():
    spec = BN254_FR
    perm = Poseidon.create(spec, arity=2)
    mesh = local_mesh(8)
    batch = 32
    vals = np.random.RandomState(0).randint(
        0, 1 << 14, size=(spec.n_limbs, 2, batch)
    ).astype(np.uint32)
    single = np.asarray(perm.hash(vals))
    multi = np.asarray(sharded_poseidon_hash(perm, mesh, vals))
    assert np.array_equal(single, multi)


@pytest.mark.heavy
@needs_8
def test_sharded_msm_matches_oracle():
    curve = BN254_G1
    mesh = local_mesh(8)
    n = 8
    pts = [refc.random_point(curve, RNG) for _ in range(n)]
    ks = [RNG.randrange(1 << 8) for _ in range(n)]
    want = refc.msm(curve, ks, pts)
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    out = sharded_msm(curve, mesh, scal, P, window_bits=4, n_bits=8)
    assert jac.to_affine_ints(curve, out) == want


@needs_8
def test_sharded_msm_toy_curve_fast():
    # Fast-suite EC collective coverage: the 2-limb toy curve compiles in
    # seconds (the production curves take 30+ min per XLA:CPU executable —
    # they stay in the heavy suite above). Identical code path.
    from openzl_tpu.curves.spec import toy_curve

    curve = toy_curve()
    mesh = local_mesh(8)
    n = 8
    ks = [RNG.randrange(1, 1 << 4) for _ in range(n)]
    G = refc.generator(curve)
    want = refc.scalar_mul(curve, sum(ks), G)
    P = jac.generator(curve, (n,))
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    out = sharded_msm(curve, mesh, scal, P, window_bits=2, n_bits=4)
    assert jac.to_affine_ints(curve, out) == want


@needs_8
def test_sharded_ntt_matches_single_chip():
    spec = BLS12_381_FR
    mesh = local_mesh(8)
    n = 1 << 9
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    single = np.asarray(nttmod.ntt(spec, x))
    multi = np.asarray(sharded_ntt(spec, mesh, x))
    assert np.array_equal(single, multi)
