"""Headline benchmark: batched Poseidon permutation throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (openzklib/openzl) publishes no numbers (BASELINE.md);
the driver-set north-star target is 5M Poseidon permutations/s/chip at batch
2^16 over BN254 Fr (BASELINE.json). vs_baseline = value / 5e6.

Uses the Pallas VMEM-resident kernel (openzl_tpu/ops/poseidon_kernel.py);
falls back to the jnp path if the kernel fails to compile on this backend.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from openzl_tpu.crypto.poseidon.permutation import Poseidon
    from openzl_tpu.fields.spec import BN254_FR

    spec = BN254_FR
    batch = 1 << 16
    perm = Poseidon.create(spec, arity=2)

    rng = np.random.default_rng(0)
    # Uniform sub-modulus states: sample 16-bit limbs and reduce top limb range.
    state = rng.integers(
        0, 1 << 16, size=(spec.n_limbs, perm.width, batch), dtype=np.uint32
    )
    state[-1] &= 0x3FFF  # keep below the modulus (top limb of BN254 Fr > 0x3064)

    state = jax.device_put(state)
    n_iters = 50

    # Dispatch once, iterate on device in the kernel's lane layout (layout
    # conversion costs ~1 permutation of HBM traffic, so it sits outside the
    # timed loop). The final readback is the only reliable fence through the
    # axon tunnel.
    from jax import lax

    try:
        from openzl_tpu.ops import poseidon_kernel as pk

        lanes = tuple(pk.to_lanes(state))

        @jax.jit
        def chained(ls):
            return lax.fori_loop(
                0, n_iters, lambda i, x: pk.permute_lanes(perm, x), ls
            )

        out = chained(lanes)
        _ = np.asarray(out[0][0, 0, 0, 0])  # compile + hard sync
        t0 = time.perf_counter()
        out = chained(lanes)
        _ = np.asarray(out[0][0, 0, 0, 0])
    except Exception:
        fn = jax.jit(perm.permute)

        @jax.jit
        def chained(s):
            return lax.fori_loop(0, n_iters, lambda i, x: fn(x), s)

        out = chained(state)
        _ = np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        out = chained(state)
        _ = np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iters

    perms_per_s = batch / dt
    print(
        json.dumps(
            {
                "metric": "poseidon_perm_throughput_bn254_b65536",
                "value": round(perms_per_s, 1),
                "unit": "perms/s/chip",
                "vs_baseline": round(perms_per_s / 5e6, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
