"""Consolidated TPU verify drive (folds the former verify_drive{2,3,4} and
verify_drive_msm accretion into one parameterized driver — VERDICT r3
item 10).

Phases (each self-contained, run serially — ONE JAX process at a time on
the axon tunnel):

  core     golden width-3 BLS12-381 permutation + edge-value hashes vs the
           Python oracle + batched throughput        (was verify_drive.py)
  kernels  optimized-Poseidon + Poseidon2 Pallas kernels vs oracle +
           throughput trio                           (was verify_drive2.py)
  scan     MSM 2^12 dlog check, sparse matvec vs oracle, NTT 2^14
           round-trip                                (was verify_drive3.py)
  witness  Groth16 device prove via the tape-replay witness calculator,
           div_rem gadget in-circuit                 (was verify_drive4.py)
  msm      row-gather + multi-set MSM at 2^12 vs oracle
                                                     (was verify_drive_msm.py)
  kzg      KZG commit/open on the device MSM path vs host oracle + verify
  poly     DensePoly NTT product on-device vs host schoolbook

Run: python tools/verify_drive_all.py [phase ...]   (default: core scan)
First TPU compiles take minutes through the tunnel; the persistent compile
cache (/tmp/openzl_tpu_jax_cache_axon) makes reruns fast.
"""

import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO = pathlib.Path(__file__).resolve().parent.parent


def fence(x):
    """Readback fence (block_until_ready does not reliably fence through
    the axon tunnel)."""
    return np.asarray(x)


def _golden_vec():
    vec = json.loads(
        (REPO / "tests/vectors/poseidon_perm_width3_bls381.json").read_text()
    )
    return [int(v) for v in vec["input"]], [int(v) for v in vec["output"]]


def phase_core():
    from openzl_tpu.crypto.poseidon.permutation import Poseidon
    from openzl_tpu.fields import limb
    from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
    from openzl_tpu.ref import poseidon as ref_p

    t0 = time.time()
    state_ints, want = _golden_vec()
    perm = Poseidon.create(BLS12_381_FR, arity=2)
    state = limb.pack_mont(
        BLS12_381_FR, np.array([[v] for v in state_ints], dtype=object)
    )
    out = jax.jit(perm.permute)(state)
    got = [int(v) for v in limb.unpack_mont(BLS12_381_FR, fence(out))[:, 0]]
    assert got == want, f"golden mismatch: {got}"
    print(f"core.golden OK ({time.time()-t0:.1f}s)", flush=True)

    params = ref_p.PoseidonParams.generate(BN254_FR, 3, 8, 55)
    pb = Poseidon.create(BN254_FR, arity=2)
    edge = [[0, 0], [BN254_FR.modulus - 1, BN254_FR.modulus - 1], [1, 0]]
    arr = limb.pack_mont(BN254_FR, np.array(edge, dtype=object).T)
    gd = limb.unpack_mont(BN254_FR, fence(jax.jit(pb.hash)(arr)))
    assert all(int(gd[i]) == ref_p.hash(params, e) for i, e in enumerate(edge))
    print("core.edge_hashes OK", flush=True)

    B = 1 << 15
    rng = np.random.RandomState(0)
    stj = jax.device_put(
        rng.randint(0, 1 << 16, size=(16, 3, B)).astype(np.uint32)
    )
    f = jax.jit(pb.permute)
    fence(f(stj))
    t0 = time.time()
    n = 5
    for _ in range(n):
        r = f(stj)
    fence(r)
    print(
        f"core.throughput {B*n/(time.time()-t0)/1e6:.3f} M perms/s (jnp path, batch {B})",
        flush=True,
    )


def phase_kernels():
    from jax import lax

    from openzl_tpu.crypto.poseidon.permutation import Poseidon
    from openzl_tpu.crypto.poseidon2 import Poseidon2, permute_ints
    from openzl_tpu.fields import limb
    from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
    from openzl_tpu.ops import poseidon2_kernel as pk2
    from openzl_tpu.ops import poseidon_kernel as pk

    TILE = 32 * 128
    spec = BLS12_381_FR
    perm = Poseidon.create(spec, arity=2)
    state_ints, want = _golden_vec()
    st = limb.pack_mont(spec, np.array([state_ints] * TILE, dtype=object).T)
    out = fence(pk.permute(perm, jax.numpy.asarray(st)))
    got = limb.unpack_mont(spec, out[:, :, 0])
    assert list(got) == want, f"kernels.golden mismatch: {got}"
    print("kernels.naive_golden OK", flush=True)

    rng = np.random.default_rng(0)
    for spec2 in (BN254_FR, BLS12_381_FR):
        perm2 = Poseidon.create(spec2, arity=2)
        state = rng.integers(
            0, 1 << 16, size=(spec2.n_limbs, 3, TILE), dtype=np.uint32
        )
        state[-1] &= 0x3FFF
        lanes = pk.to_lanes(jax.numpy.asarray(state))
        a = fence(pk.from_lanes(pk.permute_lanes(perm2, lanes)))
        b = fence(pk.from_lanes(pk.permute_lanes_opt(perm2, lanes)))
        assert (a == b).all(), f"optimized != naive on {spec2.name}"
        print(f"kernels.optimized=={spec2.name} OK", flush=True)

    spec3 = BN254_FR
    p2 = Poseidon2.create(spec3, arity=2)
    probes = [
        [3, 1, 2],
        [0, 0, 0],
        [spec3.modulus - 1] * 3,
        [12345, spec3.modulus - 2, 7],
    ]
    batch_vals = probes + [
        [int(x) for x in rng.integers(0, 1 << 60, size=3)]
        for _ in range(TILE - len(probes))
    ]
    st3 = limb.pack_mont(spec3, np.array(batch_vals, dtype=object).T)
    out3 = fence(pk2.permute(p2, jax.numpy.asarray(st3)))
    got3 = limb.unpack_mont(spec3, out3[:, :, : len(probes)])
    for i, probe in enumerate(probes):
        want3 = permute_ints(
            spec3, 3, p2.full_rounds, p2.partial_rounds,
            p2.ext_keys_int, p2.int_keys_int, probe,
        )
        assert [int(x) for x in got3[:, i]] == want3, f"poseidon2 probe {i}"
    print("kernels.poseidon2_oracle OK", flush=True)

    B, n_iters = 1 << 16, 50
    state = rng.integers(0, 1 << 16, size=(spec3.n_limbs, 3, B), dtype=np.uint32)
    state[-1] &= 0x3FFF
    perm_c = Poseidon.create(spec3, arity=2)

    def bench(fn, lanes):
        @jax.jit
        def chained(ls):
            return lax.fori_loop(0, n_iters, lambda i, x: fn(x), ls)

        out = chained(lanes)
        fence(out[0][0, 0, 0, 0])
        t0 = time.perf_counter()
        out = chained(lanes)
        fence(out[0][0, 0, 0, 0])
        return B * n_iters / (time.perf_counter() - t0)

    lanes = tuple(pk.to_lanes(jax.device_put(state)))
    r_naive = bench(lambda x: pk.permute_lanes(perm_c, x), lanes)
    r_opt = bench(lambda x: pk.permute_lanes_opt(perm_c, x), lanes)
    r_p2 = bench(lambda x: pk2.permute_lanes(p2, x), lanes)
    print(
        json.dumps(
            {
                "classic_naive": round(r_naive, 1),
                "classic_optimized": round(r_opt, 1),
                "poseidon2": round(r_p2, 1),
                "vs_5M_target": round(r_p2 / 5e6, 4),
            }
        ),
        flush=True,
    )


def phase_scan():
    from openzl_tpu.curves import BLS12_381_G1
    from openzl_tpu.curves import jacobian as jac
    from openzl_tpu.fields import limb
    from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
    from openzl_tpu.ops import ntt as nttmod
    from openzl_tpu.ops.msm import msm
    from openzl_tpu.ops.sparse import SparseFieldMatrix
    from openzl_tpu.ref import curve as refc

    rng = random.Random(7)
    curve = BLS12_381_G1
    n = 1 << 12
    r_ord = curve.scalar.modulus
    d = [rng.randrange(1, r_ord) for _ in range(n)]
    s = [rng.randrange(r_ord) for _ in range(n)]
    t0 = time.time()
    G = jac.generator(curve, (n,))
    pts = jac.scalar_mul(
        curve, limb.pack(curve.scalar, np.array(d, dtype=object)), G
    )
    sk = limb.pack(curve.scalar, np.array(s, dtype=object))
    got_pt = jac.to_affine_ints(curve, msm(curve, sk, pts))
    want_scalar = sum(si * di for si, di in zip(s, d)) % r_ord
    want_pt = refc.scalar_mul(curve, want_scalar, refc.generator(curve))
    assert got_pt == want_pt, "MSM dlog check failed"
    print(f"scan.msm_2^12_dlog OK ({time.time()-t0:.1f}s)", flush=True)

    spec = BN254_FR
    p = spec.modulus
    rows, cols, vals = [], [], []
    n_rows, n_cols = 300, 200
    for _ in range(997):
        rows.append(rng.randrange(n_rows))
        cols.append(rng.randrange(n_cols))
        vals.append(rng.randrange(p))
    m = SparseFieldMatrix.from_coo(spec, rows, cols, vals, n_rows, n_cols)
    z = [rng.randrange(p) for _ in range(n_cols)]
    zm = jax.numpy.asarray(limb.pack_mont(spec, np.array(z, dtype=object)))
    got_v = [int(x) for x in limb.unpack_mont(spec, fence(m.matvec(zm)))]
    want_v = [0] * n_rows
    for r_, c_, v_ in zip(rows, cols, vals):
        want_v[r_] = (want_v[r_] + v_ * z[c_]) % p
    assert got_v == want_v, "sparse matvec mismatch"
    print("scan.sparse_matvec OK", flush=True)

    fr = BLS12_381_FR
    nn = 1 << 14
    coeffs = np.array([rng.randrange(fr.modulus) for _ in range(nn)], dtype=object)
    x = jax.numpy.asarray(limb.pack_mont(fr, coeffs))
    t0 = time.time()
    back = nttmod.intt(fr, nttmod.ntt(fr, x))
    assert np.array_equal(fence(back), np.asarray(x)), "NTT roundtrip failed"
    print(f"scan.ntt_2^14_roundtrip OK ({time.time()-t0:.1f}s)", flush=True)


def phase_witness():
    from openzl_tpu.crypto.constraint import InputBuilder
    from openzl_tpu.crypto.poseidon import gadget as pg
    from openzl_tpu.curves import edwards as ed
    from openzl_tpu.eclair.gadgets import div_rem_mod_prime
    from openzl_tpu.proof_systems import Groth16
    from openzl_tpu.ref import pairing as refpair
    from openzl_tpu.ref import poseidon as refposeidon

    RNG = random.Random(0xD1CE)
    g16 = Groth16(refpair.BN254, backend="device")
    params = refposeidon.PoseidonParams.generate(g16.fr, 3, 8, 55)
    p = g16.fr.modulus
    m = ed.BABY_JUBJUB.order
    CHAIN = 64

    def build(com, witness=None, digest=None):
        h_pub = com.public_input(digest)
        h = com.secret_witness(None if witness is None else witness[0])
        for i in range(CHAIN):
            w = com.secret_witness(None if witness is None else witness[1 + i])
            h = pg.hash(com, params, [h, w])
        div_rem_mod_prime(com, h, m)
        com.assert_eq(h, h_pub)
        return com.cs

    witness = [RNG.randrange(p) for _ in range(CHAIN + 1)]
    h = witness[0]
    for i in range(CHAIN):
        h = refposeidon.hash(params, [h, witness[1 + i]])
    digest = h

    setup_cs = build(g16.context_compiler())
    print(f"witness.constraints={setup_cs.num_constraints}", flush=True)
    pk = g16.compile(setup_cs, RNG)
    calc = g16.witness_calculator(setup_cs)
    t0 = time.perf_counter()
    z = calc.evaluate([digest], witness, backend="native")
    t_wit = time.perf_counter() - t0
    prove_cs = build(g16.proof_compiler(), witness, digest)
    assert z == prove_cs.assignment(), "tape replay != python re-trace"
    print(f"witness.native_tape {t_wit*1e3:.1f} ms, matches re-trace", flush=True)
    proof = g16.prove_assigned(pk, z, RNG)
    inputs = InputBuilder(p).extend_field(digest).build()
    assert g16.verify(pk.vk, inputs, proof), "proof did not verify"
    assert not g16.verify(pk.vk, [(digest + 1) % p], proof)
    print("witness.groth16_prove_assigned OK", flush=True)


def phase_msm():
    from openzl_tpu.curves import jacobian as jac
    from openzl_tpu.curves.spec import BLS12_381_G1
    from openzl_tpu.fields import limb
    from openzl_tpu.ops import msm as msmmod
    from openzl_tpu.ref import curve as refc

    curve = BLS12_381_G1
    RNG = random.Random(42)
    n = 1 << 12
    ks = [RNG.randrange(1, 1 << 30) for _ in range(n)]
    scal_k = np.asarray(limb.pack(curve.scalar, np.array(ks, dtype=object)))
    pts = msmmod.fixed_base_msm(curve, scal_k, n_bits=30)
    r_mod = curve.scalar.modulus
    ss = [RNG.randrange(1, r_mod) for _ in range(n)]
    scal = np.asarray(limb.pack(curve.scalar, np.array(ss, dtype=object)))

    t0 = time.perf_counter()
    got = jac.to_affine_ints(curve, msmmod.msm(curve, scal, pts))
    print(f"msm.single wall {time.perf_counter()-t0:.1f}s", flush=True)
    want_k = sum(a * b for a, b in zip(ks, ss)) % r_mod
    assert got == refc.scalar_mul(curve, want_k, refc.generator(curve))
    print("msm.dlog OK", flush=True)

    F = jac.field_ops(curve)
    sets, wants = [], []
    for s in range(3):
        mask = [(i % (5 + s)) != 0 for i in range(n)]
        sets.append(
            jac.JPoint(
                pts.x, pts.y, F.select(np.array(mask), pts.z, F.zeros((n,)))
            )
        )
        w = sum(a * b for a, b, m_ in zip(ks, ss, mask) if m_) % r_mod
        wants.append(refc.scalar_mul(curve, w, refc.generator(curve)))
    t0 = time.perf_counter()
    outs = msmmod.msm_multi(curve, scal, sets)
    for o, w in zip(outs, wants):
        assert jac.to_affine_ints(curve, o) == w, "msm_multi mismatch"
    print(f"msm.multi OK, wall {time.perf_counter()-t0:.1f}s", flush=True)


def phase_kzg():
    from openzl_tpu.proof_systems import KZG, KZGParams
    from openzl_tpu.ref import pairing as refpair

    RNG = random.Random(0x6B)
    k = KZG(refpair.BN254, backend="device")
    t0 = time.perf_counter()
    params = k.setup(1023, random.Random(5))
    print(f"kzg.setup(1023) wall {time.perf_counter()-t0:.1f}s", flush=True)
    kh = KZG(refpair.BN254, backend="host")
    params_h = KZGParams.from_bytes(k.pairing, params.to_bytes())
    r = k.pairing.r
    coeffs = [RNG.randrange(r) for _ in range(1024)]
    t0 = time.perf_counter()
    C = k.commit(params, coeffs)
    print(f"kzg.commit wall {time.perf_counter()-t0:.1f}s", flush=True)
    assert C == kh.commit(params_h, coeffs), "device commit != host"
    z = RNG.randrange(r)
    v, w = k.open(params, coeffs, z)
    assert k.verify(params, C, z, v, w)
    assert not k.verify(params, C, z, (v + 1) % r, w)
    print("kzg OK", flush=True)


def phase_poly():
    from openzl_tpu.fields.spec import BLS12_381_FR
    from openzl_tpu.ops import poly as polymod
    from openzl_tpu.ops.poly import DensePoly

    RNG = random.Random(0x907)
    spec = BLS12_381_FR
    a = DensePoly.rand(spec, 700, RNG)
    b = DensePoly.rand(spec, 500, RNG)
    t0 = time.perf_counter()
    got = a * b  # 1201 coeffs >= _NTT_MUL_MIN -> device NTT product
    print(f"poly.ntt_mul wall {time.perf_counter()-t0:.1f}s", flush=True)
    saved = polymod._NTT_MUL_MIN
    polymod._NTT_MUL_MIN = 1 << 30
    try:
        want = a * b  # host schoolbook
    finally:
        polymod._NTT_MUL_MIN = saved
    assert got == want, "NTT product != schoolbook"
    print("poly OK", flush=True)


PHASES = {
    "core": phase_core,
    "kernels": phase_kernels,
    "scan": phase_scan,
    "witness": phase_witness,
    "msm": phase_msm,
    "kzg": phase_kzg,
    "poly": phase_poly,
}


def main():
    names = sys.argv[1:] or ["core", "scan"]
    if names == ["all"]:
        names = list(PHASES)
    print("platform:", jax.devices()[0].platform, flush=True)
    for name in names:
        print(f"=== phase {name} ===", flush=True)
        PHASES[name]()
    print("VERIFY DRIVE PASSED:", " ".join(names), flush=True)


if __name__ == "__main__":
    main()
