"""Headline benchmark: batched Poseidon permutation throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (openzklib/openzl) publishes no numbers (BASELINE.md);
the driver-set north-star target is 5M Poseidon permutations/s/chip at batch
2^16 over BN254 Fr (BASELINE.json). vs_baseline = value / 5e6.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from openzl_tpu.crypto.poseidon.permutation import Poseidon
    from openzl_tpu.fields import limb
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

    fn = jax.jit(perm.permute)
    out = fn(state)
    out.block_until_ready()  # compile

    # steady-state timing
    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(state)
    out.block_until_ready()
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
