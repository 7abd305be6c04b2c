"""Device-backend Groth16 at scale: Poseidon hash-chain circuit >= 2^14
constraints, setup/prove/verify wall-clock on the real TPU.

Circuit: h_{i+1} = Poseidon(h_i, w_i) over `chain` links; public input is
the final digest (preimage-knowledge of the whole chain). Emits one JSON
line per phase and appends to SCALE_r05.json if present.

Run: python tools/bench_groth16.py [--chain 64]
"""

import argparse
import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openzl_tpu.crypto.constraint import InputBuilder
from openzl_tpu.crypto.poseidon import gadget as poseidon_gadget
from openzl_tpu.proof_systems import Groth16
from openzl_tpu.ref import pairing as refpair
from openzl_tpu.ref import poseidon as refposeidon

RNG = random.Random(0xBEEF)


def build(g16, params, chain, witness=None, digest=None):
    com = g16.proof_compiler() if witness is not None else g16.context_compiler()
    h_pub = com.public_input(digest)
    h = com.secret_witness(None if witness is None else witness[0])
    for i in range(chain):
        w = com.secret_witness(None if witness is None else witness[1 + i])
        h = poseidon_gadget.hash(com, params, [h, w])
    com.assert_eq(h, h_pub)
    return com.cs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument(
        "--tag", type=str, default="",
        help="metric suffix, e.g. 'coldcache' for a fresh-process run "
        "against the populated persistent compile cache (VERDICT r3 "
        "item 6: the warm-start story)",
    )
    ap.add_argument(
        "--staged", action="store_true",
        help="host-offload the proving-key queries and run the HBM-staged "
        "per-stage MSM prove (required to fit c=2^20 on one chip)",
    )
    args = ap.parse_args()
    tag = f"_{args.tag}" if args.tag else ""
    print("platform:", jax.devices()[0].platform, flush=True)

    g16 = Groth16(refpair.BN254, backend="device")
    params = refposeidon.PoseidonParams.generate(g16.fr, 3, 8, 55)
    p = g16.fr.modulus

    witness = [RNG.randrange(p) for _ in range(args.chain + 1)]
    h = witness[0]
    for i in range(args.chain):
        h = refposeidon.hash(params, [h, witness[1 + i]])
    digest = h

    results = []

    def rec(metric, dt, extra=None):
        row = {"metric": metric, "value": round(dt * 1e3, 1), "unit": "ms"}
        if extra:
            row.update(extra)
        results.append(row)
        print(json.dumps(row), flush=True)
        # write-through so a crashed later phase never loses this record
        out = pathlib.Path(__file__).parent.parent / "SCALE_r05.json"
        prior = json.loads(out.read_text()) if out.exists() else []
        merged = [r for r in prior if r["metric"] != metric] + [row]
        out.write_text(json.dumps(merged, indent=1))

    t0 = time.perf_counter()
    setup_cs = build(g16, params, args.chain)
    t_build = time.perf_counter() - t0
    nc = setup_cs.num_constraints
    print(f"constraints: {nc} (~2^{nc.bit_length()-1}), build {t_build:.1f}s", flush=True)

    t0 = time.perf_counter()
    pk = g16.compile(setup_cs, RNG)
    rec(f"groth16_setup_c{nc}{tag}", time.perf_counter() - t0, {"constraints": nc})
    if args.staged:
        pk = pk.offload_queries()
        print("proving-key queries offloaded to host (staged prove)", flush=True)

    # witness synthesis: native tape replay (no Python gadget re-trace);
    # the calculator itself is built once per circuit alongside the pk
    calc = g16.witness_calculator(setup_cs)
    t0 = time.perf_counter()
    z = calc.evaluate_limbs([digest], witness)
    t_wit = time.perf_counter() - t0

    t0 = time.perf_counter()
    proof = g16.prove_assigned(pk, z, RNG)
    rec(
        f"groth16_prove_c{nc}{tag}", time.perf_counter() - t0,
        {"constraints": nc, "witness_synthesis_ms": round(t_wit * 1e3, 1)},
    )

    # Warm prove: a prover service reuses the jitted NTT/MSM executables, so
    # steady-state latency excludes the one-time XLA compiles (fresh r,s —
    # the proof is re-randomized and re-verified below). Includes a fresh
    # witness synthesis, as a prover service would per request.
    t0 = time.perf_counter()
    z = calc.evaluate_limbs([digest], witness)
    proof = g16.prove_assigned(pk, z, RNG)
    rec(
        f"groth16_prove_warm_c{nc}{tag}", time.perf_counter() - t0,
        {"constraints": nc},
    )

    t0 = time.perf_counter()
    inputs = InputBuilder(p).extend_field(digest).build()
    ok = g16.verify(pk.vk, inputs, proof)
    rec(f"groth16_verify_c{nc}{tag}", time.perf_counter() - t0, {"ok": bool(ok)})
    assert ok, "proof did not verify"
    bad = g16.verify(pk.vk, [(digest + 1) % p], proof)
    assert not bad, "fuzzed input accepted"
    print("verify OK, fuzzed input rejected", flush=True)

    from openzl_tpu.utils import aot_cache

    if aot_cache.cache_dir():
        # cold-start attribution (VERDICT r4 item 5): hits = executables
        # served without tracing or compiling; load_s = deserialize+load
        # cost; compile_s = trace+compile cost of the misses
        stats = dict(aot_cache.STATS)
        stats = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in stats.items()
        }
        print(json.dumps({"metric": "aot_cache_stats", **stats}), flush=True)
        results.append({"metric": f"aot_cache_stats_c{nc}{tag}", **stats})

    out = pathlib.Path(__file__).parent.parent / "SCALE_r05.json"
    prior = json.loads(out.read_text()) if out.exists() else []
    seen = {r["metric"] for r in results}
    merged = [r for r in prior if r["metric"] not in seen] + results
    out.write_text(json.dumps(merged, indent=1))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
