"""Scale evidence on real TPU: NTT 2^18-2^22, MSM 2^16-2^20, Merkle depth-20.

Emits one JSON line per metric (appended to SCALE_r03.json-style records) and
prints human-readable progress. Run serially (one JAX process):
    python tools/bench_scale.py [--quick]

Correctness at scale is checked structurally:
  * NTT: intt(ntt(x)) == x at every size (and ntt vs naive DFT is covered at
    small sizes by tests/test_ntt.py)
  * MSM: points are generated as d_i * G with known 64-bit dlogs, so the MSM
    result must equal (sum s_i d_i mod r) * G — verified with one host
    scalar-mul.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.ops.msm import fixed_base_msm, msm
from openzl_tpu.ref import curve as refc

RESULTS = []


OUT = pathlib.Path(__file__).parent.parent / "SCALE_r05.json"


def record(metric, value, unit, extra=None):
    row = {"metric": metric, "value": round(value, 3), "unit": unit}
    if extra:
        row.update(extra)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
    # write-through so a crashed later phase never loses finished results
    prior = json.loads(OUT.read_text()) if OUT.exists() else []
    merged = [r for r in prior if r["metric"] != metric] + [row]
    OUT.write_text(json.dumps(merged, indent=1))


def fence(x):
    return np.asarray(x)


def bench_ntt(sizes, iters=16):
    """Per-transform latency from `iters` chained transforms in one jit:
    a single dispatch through the axon relay costs ~35 ms regardless of
    work (experiments/rowshuffle_probe.py), so one-shot timing would be
    overhead-bound at these sizes."""
    from jax import lax

    spec = BLS12_381_FR
    rng = np.random.default_rng(0)
    for log_n in sizes:
        n = 1 << log_n
        x = rng.integers(0, 1 << 16, size=(spec.n_limbs, n), dtype=np.uint32)
        x[-1] &= 0x3FFF
        xd = jax.device_put(x)
        y = nttmod.ntt(spec, xd)
        fence(y[0, :1])  # compile + sync
        back = fence(nttmod.intt(spec, y))
        assert (back == x).all(), f"NTT round-trip failed at 2^{log_n}"

        tables = None
        if n >= nttmod._FOURSTEP_MIN:
            from openzl_tpu.ops import ntt_kernel

            tables = nttmod._fourstep_tables(
                spec, log_n, False, ntt_kernel._M_MAX, 1
            )

        # tables ride in as jit ARGUMENTS: closure-captured device arrays are
        # inlined as HLO literals, and at 2^21+ the root tables alone exceed
        # the axon remote-compile request size limit (HTTP 413)
        @jax.jit
        def chain(v, tb):
            def body(c, _):
                if tb is not None:
                    c = nttmod._fourstep_core(spec, c, tb, False)
                else:
                    c = nttmod._ntt_core(spec, c, False)
                return c, None

            out, _ = lax.scan(body, v, None, length=iters)
            return out

        out = chain(xd, tables)
        fence(out[0, :1])
        t0 = time.perf_counter()
        out = chain(xd, tables)
        fence(out[0, :1])
        dt = (time.perf_counter() - t0) / iters
        record(
            f"ntt_bls381_fr_2^{log_n}",
            dt * 1e3,
            "ms",
            {"roundtrip_ok": True, "amortized_iters": iters},
        )


def bench_msm(sizes):
    curve = BLS12_381_G1
    r = curve.scalar.modulus
    rng = np.random.default_rng(1)
    for log_n in sizes:
        n = 1 << log_n
        # points with known dlogs: P_i = d_i G, d_i 64-bit
        d = rng.integers(1, 1 << 63, size=n, dtype=np.uint64)
        dk = limb.pack(curve.scalar, d.astype(object))
        pts = fixed_base_msm(curve, jnp.asarray(dk), n_bits=64)
        fence(pts.x[0, :1])
        # full-width random scalars
        s = [int(x) for x in rng.integers(0, 1 << 62, size=n, dtype=np.int64)]
        s = [(si * 0x9E3779B97F4A7C15) % r for si in s]
        sk = jnp.asarray(limb.pack(curve.scalar, np.array(s, dtype=object)))
        out = msm(curve, sk, pts)
        fence(out.x[:1])  # compile + sync (result is scalar-batch: 1-D limbs)
        t0 = time.perf_counter()
        out = msm(curve, sk, pts)
        fence(out.x[:1])
        dt = time.perf_counter() - t0
        got = jac.to_affine_ints(curve, out)
        want_scalar = sum(si * int(di) for si, di in zip(s, d)) % r
        want = refc.scalar_mul(curve, want_scalar, refc.generator(curve))
        ok = got == want
        record(
            f"msm_bls381_g1_2^{log_n}", dt * 1e3, "ms",
            {"dlog_check_ok": bool(ok), "points_per_s": round(n / dt, 1)},
        )
        assert ok, f"MSM dlog check failed at 2^{log_n}"


def bench_msm_g2(sizes):
    """G2 (Fq2) MSM with dlog checks — the Groth16 b2-query dispatch
    (VERDICT r3 weak item 5: no G2/Fq2 MSM perf was ever recorded)."""
    from openzl_tpu.curves.spec import BLS12_381_G2

    curve = BLS12_381_G2
    r = curve.scalar.modulus
    rng = np.random.default_rng(3)
    for log_n in sizes:
        n = 1 << log_n
        d = rng.integers(1, 1 << 63, size=n, dtype=np.uint64)
        dk = limb.pack(curve.scalar, d.astype(object))
        pts = fixed_base_msm(curve, jnp.asarray(dk), n_bits=64)
        fence(pts.x[0, 0, :1])
        s = [int(x) for x in rng.integers(0, 1 << 62, size=n, dtype=np.int64)]
        s = [(si * 0x9E3779B97F4A7C15) % r for si in s]
        sk = jnp.asarray(limb.pack(curve.scalar, np.array(s, dtype=object)))
        out = msm(curve, sk, pts)
        fence(out.x[:1])
        t0 = time.perf_counter()
        out = msm(curve, sk, pts)
        fence(out.x[:1])
        dt = time.perf_counter() - t0
        got = jac.to_affine_ints(curve, out)
        want_scalar = sum(si * int(di) for si, di in zip(s, d)) % r
        want = refc.scalar_mul(curve, want_scalar, refc.generator(curve))
        ok = got == want
        record(
            f"msm_bls381_g2_2^{log_n}", dt * 1e3, "ms",
            {"dlog_check_ok": bool(ok), "points_per_s": round(n / dt, 1)},
        )
        assert ok, f"G2 MSM dlog check failed at 2^{log_n}"


def bench_merkle(height=20, n_leaves=1 << 16):
    from openzl_tpu.crypto.merkle.tree import MerkleParameters, MerkleTree

    spec = BLS12_381_FR
    params = MerkleParameters(spec, height)
    rng = np.random.default_rng(2)
    leaves = rng.integers(0, 1 << 16, size=(spec.n_limbs, n_leaves), dtype=np.uint32)
    leaves[-1] &= 0x3FFF
    t0 = time.perf_counter()
    tree = MerkleTree.from_leaf_digests(params, leaves)
    _ = tree.root()
    cold = time.perf_counter() - t0
    # warm rebuild: the masked single-trace builder makes every level reuse
    # one compiled shape, so steady-state cost is pure hash throughput
    t0 = time.perf_counter()
    tree = MerkleTree.from_leaf_digests(params, leaves)
    _ = tree.root()
    dt = time.perf_counter() - t0
    record(
        f"merkle_build_h{height}_2^{int(np.log2(n_leaves))}", dt * 1e3, "ms",
        {"leaves_per_s": round(n_leaves / dt, 1), "cold_ms": round(cold * 1e3, 1)},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-merkle", action="store_true")
    ap.add_argument("--skip-ntt", action="store_true")
    ap.add_argument("--skip-msm", action="store_true")
    ap.add_argument("--skip-msm-g2", action="store_true")
    ap.add_argument("--ntt-sizes", type=str, default=None,
                    help="comma-separated log2 sizes, e.g. 21,22")
    ap.add_argument("--msm-sizes", type=str, default=None)
    ap.add_argument("--msm-g2-sizes", type=str, default=None)
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)

    ntt_sizes = [18, 20] if args.quick else [18, 19, 20, 21, 22]
    msm_sizes = [16] if args.quick else [16, 18, 20]
    g2_sizes = [16] if args.quick else [16, 18]
    if args.ntt_sizes:
        ntt_sizes = [int(s) for s in args.ntt_sizes.split(",")]
    if args.msm_sizes:
        msm_sizes = [int(s) for s in args.msm_sizes.split(",")]
    if args.msm_g2_sizes:
        g2_sizes = [int(s) for s in args.msm_g2_sizes.split(",")]
    if not args.skip_ntt:
        bench_ntt(ntt_sizes)
    if not args.skip_msm:
        bench_msm(msm_sizes)
    if not args.skip_msm_g2:
        bench_msm_g2(g2_sizes)
    if not args.skip_merkle:
        try:
            bench_merkle()
        except Exception as e:  # tree API may differ; report, don't die
            print("merkle bench failed:", e, flush=True)

    out = OUT
    prior = json.loads(out.read_text()) if out.exists() else []
    seen = {r["metric"] for r in RESULTS}
    merged = [r for r in prior if r["metric"] not in seen] + RESULTS
    out.write_text(json.dumps(merged, indent=1))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
