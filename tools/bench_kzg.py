"""KZG + DensePoly scale evidence on the real TPU (VERDICT r4 item 10).

Phases (all self-checking):
  * KZG10 setup (device fixed-base powers-of-tau), commit and open at
    degree 2^16 - 1 through the device MSM pipeline, one verify + one
    distinct-point batch_verify against a second opening.
  * DensePoly.divide_by_vanishing_poly at quotient length 2^20: host
    bigint fold vs the device suffix-sum path (bit-exactness asserted
    on a 2^12 prefix; full host fold at 2^20 is the timing reference).

Appends one JSON row per metric to SCALE_r05.json.
Run serially (one JAX process): python tools/bench_kzg.py
"""

import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.ops.poly import DensePoly, Radix2Domain
from openzl_tpu.proof_systems import KZG
from openzl_tpu.ref import pairing as refpair

OUT = pathlib.Path(__file__).parent.parent / "SCALE_r05.json"
RESULTS = []
RNG = random.Random(0x6B7A)


def record(metric, value, unit, extra=None):
    row = {"metric": metric, "value": round(value, 3), "unit": unit}
    if extra:
        row.update(extra)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
    prior = json.loads(OUT.read_text()) if OUT.exists() else []
    merged = [r for r in prior if r["metric"] != metric] + [row]
    OUT.write_text(json.dumps(merged, indent=1))


def bench_kzg(log_deg=16):
    n = 1 << log_deg
    k = KZG(refpair.BN254, backend="device")
    r = k.pairing.r

    t0 = time.perf_counter()
    params = k.setup(n - 1, RNG)
    record(
        f"kzg_setup_deg2^{log_deg}", (time.perf_counter() - t0) * 1e3, "ms"
    )

    coeffs = [RNG.randrange(r) for _ in range(n)]
    C = k.commit(params, coeffs)  # compile
    t0 = time.perf_counter()
    C = k.commit(params, coeffs)
    record(
        f"kzg_commit_deg2^{log_deg}", (time.perf_counter() - t0) * 1e3, "ms",
        {"warm": True},
    )

    z = RNG.randrange(r)
    t0 = time.perf_counter()
    v, w = k.open(params, coeffs, z)
    record(
        f"kzg_open_deg2^{log_deg}", (time.perf_counter() - t0) * 1e3, "ms",
        {"note": "host synthetic division + device witness MSM"},
    )

    t0 = time.perf_counter()
    ok = k.verify(params, C, z, v, w)
    record(
        f"kzg_verify", (time.perf_counter() - t0) * 1e3, "ms", {"ok": bool(ok)}
    )
    assert ok, "KZG opening did not verify"
    assert not k.verify(params, C, z, (v + 1) % r, w)

    # distinct-point batch with a second, smaller opening
    coeffs2 = [RNG.randrange(r) for _ in range(n // 2)]
    C2 = k.commit(params, coeffs2)
    z2 = RNG.randrange(r)
    v2, w2 = k.open(params, coeffs2, z2)
    t0 = time.perf_counter()
    ok = k.batch_verify(params, [(C, z, v, w), (C2, z2, v2, w2)], RNG)
    record(
        "kzg_batch_verify_2_distinct", (time.perf_counter() - t0) * 1e3,
        "ms", {"ok": bool(ok)},
    )
    assert ok, "distinct-point batch did not verify"
    assert not k.batch_verify(
        params, [(C, z, (v + 1) % r, w), (C2, z2, v2, w2)], RNG
    )
    print("kzg self-checks OK", flush=True)


def bench_vanishing_divide(log_n=20):
    spec = BN254_FR
    n = 1 << log_n
    dom = Radix2Domain.new(spec, n)
    a = DensePoly.rand(spec, 2 * n - 2, RNG)  # the Groth16 H-poly shape

    t0 = time.perf_counter()
    qd, rd = a.divide_by_vanishing_poly(dom, device=True)
    dt_dev = time.perf_counter() - t0
    record(
        f"poly_vanish_div_dev_2^{log_n}", dt_dev * 1e3, "ms",
        {"note": "device suffix-sum path incl. pack/unpack"},
    )

    t0 = time.perf_counter()
    qh, rh = a.divide_by_vanishing_poly(dom, device=False)
    dt_host = time.perf_counter() - t0
    record(
        f"poly_vanish_div_host_2^{log_n}", dt_host * 1e3, "ms",
        {"speedup_dev": round(dt_host / dt_dev, 2)},
    )
    assert qd == qh and rd == rh, "device vanishing divide mismatch"
    print("vanishing-divide bit-exact OK", flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    bench_kzg()
    bench_vanishing_divide()
    print("wrote", OUT, flush=True)
