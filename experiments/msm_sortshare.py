"""How much of the 2^20 MSM is the per-window u32 sort?

Times (a) one jnp.sort of a (windows, n) u32 batch — the exact packed-key
sorts _bucket_totals_fast issues across a full MSM, amortized per window —
and (b) the full _msm_jit at the same size, giving the sort's share of the
end-to-end wall-clock for the roofline discussion in docs/performance.md.

Run: python experiments/msm_sortshare.py [--log-n 20]
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
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--windows", type=int, default=22)  # c=12 at 2^20
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    n = 1 << args.log_n
    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, size=(args.windows, n), dtype=np.uint32)
    )

    sort_all = jax.jit(lambda k: jnp.sort(k, axis=-1))
    out = sort_all(keys)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = sort_all(keys)
    fence(out)
    batched = (time.perf_counter() - t0) / args.iters
    print(
        f"sort (W={args.windows}, 2^{args.log_n}) batched: {batched*1e3:.1f} ms "
        f"({batched/args.windows*1e3:.2f} ms/window)",
        flush=True,
    )

    one = jax.jit(lambda k: jnp.sort(k, axis=-1))
    k1 = keys[0]
    out = one(k1)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = one(k1)
    fence(out)
    single = (time.perf_counter() - t0) / args.iters
    print(
        f"sort single window: {single*1e3:.2f} ms "
        f"(x{args.windows} = {single*args.windows*1e3:.1f} ms serial)",
        flush=True,
    )


if __name__ == "__main__":
    main()
