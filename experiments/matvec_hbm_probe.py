"""Does the c=2^20 prover's sparse matvec fit in single-chip HBM?

Compiles _matvec_jit at the exact failing shape from the chain-4480
Groth16 run (n_rows = 2^20 domain, nnz padded to 2^23) with synthetic COO
data. Round-4 fix under test: the terms product now runs through the
fused-VMEM Pallas mont_mul instead of the XLA limb path, whose
O(n_limbs^2 * nnz) partial-product temps alone exceeded the 16 GB HBM
(queue_groth16_1m: 'Used 16.38G of 15.75G').

Run: python experiments/matvec_hbm_probe.py [--log-nnz 23]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.ops.sparse import SparseFieldMatrix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-nnz", type=int, default=23)
    ap.add_argument("--log-rows", type=int, default=20)
    args = ap.parse_args()
    spec = BN254_FR
    p = spec.modulus
    n_rows, nnz = 1 << args.log_rows, 1 << args.log_nnz
    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n_rows, size=nnz)).astype(np.int32)
    cols = rng.integers(0, n_rows, size=nnz).astype(np.int32)
    # small coefficients keep the host pack fast; math is shape-driven
    ints = [int(v) for v in rng.integers(1, 1 << 30, size=nnz)]
    m = SparseFieldMatrix(
        spec, n_rows, n_rows, rows, cols,
        limb.pack_mont(spec, np.array(ints, dtype=object)),
    )
    zv = [int(v) for v in rng.integers(0, 1 << 30, size=n_rows)]
    z = jax.device_put(limb.pack_mont(spec, np.array(zv, dtype=object)))

    t0 = time.perf_counter()
    out = m.matvec(z)
    np.asarray(out[0, :1])
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = m.matvec(z)
    np.asarray(out[0, :1])
    print(f"steady {time.perf_counter()-t0:.3f}s", flush=True)

    # spot-check 3 random rows against host arithmetic
    got = [int(v) for v in limb.unpack_mont(spec, np.asarray(out))]
    for r in rng.integers(0, n_rows, size=3):
        want = 0
        for j in np.nonzero(rows == r)[0]:
            want = (want + ints[j] * zv[cols[j]]) % p
        assert got[r] == want, f"row {r} mismatch"
    print("MATVEC PROBE OK", flush=True)


if __name__ == "__main__":
    main()
