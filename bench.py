"""Headline benchmark: batched Poseidon-2 permutation throughput, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (openzklib/openzl) publishes no numbers (BASELINE.md);
the driver-set north-star target is the "Poseidon-2 permutation throughput
(BN254 Fr, batch 2^16) >= 5M perms/s/chip" row of BASELINE.md.
vs_baseline = value / 5e6.

The headline path is the Poseidon2 Pallas kernel
(openzl_tpu/ops/poseidon2_kernel.py — S-box-only Montgomery multiplies,
addition-only linear layers). Secondary numbers for the classic Poseidon
permutation (naive + optimized sparse partial rounds) are recorded by
tools/verify_drive_all.py (kernels phase) and docs/performance.md; classic
remains the reference-conformance anchor (sage golden vectors).

Fallback chain if the kernel cannot compile on this backend: classic
optimized kernel, then the jnp path.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from jax import lax

    from openzl_tpu.fields.spec import BN254_FR

    spec = BN254_FR
    batch = 1 << 16
    n_iters = 50

    rng = np.random.default_rng(0)
    state = rng.integers(
        0, 1 << 16, size=(spec.n_limbs, 3, batch), dtype=np.uint32
    )
    state[-1] &= 0x3FFF  # keep below the modulus (top limb of BN254 Fr)
    state = jax.device_put(state)

    # Dispatch once, iterate on device in kernel lane layout; the readback
    # is the only reliable fence through the axon tunnel.
    def run(permute_lanes, perm, lanes):
        @jax.jit
        def chained(ls):
            return lax.fori_loop(0, n_iters, lambda i, x: permute_lanes(perm, x), ls)

        out = chained(lanes)
        _ = np.asarray(out[0][0, 0, 0, 0])  # compile + hard sync
        t0 = time.perf_counter()
        out = chained(lanes)
        _ = np.asarray(out[0][0, 0, 0, 0])
        return batch * n_iters / (time.perf_counter() - t0)

    metric = "poseidon2_perm_throughput_bn254_b65536"
    try:
        from openzl_tpu.crypto.poseidon2 import Poseidon2
        from openzl_tpu.ops import poseidon2_kernel as pk2
        from openzl_tpu.ops.poseidon_kernel import to_lanes

        perm2 = Poseidon2.create(spec, arity=2)
        perms_per_s = run(pk2.permute_lanes, perm2, tuple(to_lanes(state)))
    except Exception:
        try:
            from openzl_tpu.crypto.poseidon.permutation import Poseidon
            from openzl_tpu.ops import poseidon_kernel as pk

            perm = Poseidon.create(spec, arity=2)
            metric = "poseidon_opt_perm_throughput_bn254_b65536"
            perms_per_s = run(pk.permute_lanes_opt, perm, tuple(pk.to_lanes(state)))
        except Exception:
            from openzl_tpu.crypto.poseidon.permutation import Poseidon

            perm = Poseidon.create(spec, arity=2)
            fn = jax.jit(perm.permute_optimized)

            @jax.jit
            def chained(s):
                return lax.fori_loop(0, n_iters, lambda i, x: fn(x), s)

            metric = "poseidon_opt_perm_throughput_bn254_b65536_jnp"
            out = chained(state)
            _ = np.asarray(out[0, 0, 0])
            t0 = time.perf_counter()
            out = chained(state)
            _ = np.asarray(out[0, 0, 0])
            perms_per_s = batch * n_iters / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(perms_per_s, 1),
                "unit": "perms/s/chip",
                "vs_baseline": round(perms_per_s / 5e6, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
