"""TPU verify drive #2: optimized-Poseidon + Poseidon2 kernels on real TPU.

Checks, all on the axon TPU chip:
  1. classic naive Pallas kernel reproduces the width-3 BLS12-381 golden
     permutation (and the new squaring fast path doesn't break it)
  2. optimized-rounds kernel output == naive kernel output on a random batch
  3. Poseidon2 kernel matches the python-int oracle on probe states
     (incl. edge values 0 and p-1)
  4. throughput: classic naive vs classic optimized vs Poseidon2 at 2^16

Run: python tools/verify_drive2.py   (on the axon platform; first compiles
~2 min per kernel through the tunnel).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax import lax

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.crypto.poseidon2 import Poseidon2, permute_ints
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops import poseidon2_kernel as pk2
from openzl_tpu.ops import poseidon_kernel as pk

TILE = 32 * 128


def fence(x):
    return np.asarray(x)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    # --- 1. golden vector through the naive kernel -----------------------
    spec = BLS12_381_FR
    perm = Poseidon.create(spec, arity=2)
    vec = json.load(
        open(pathlib.Path(__file__).parent.parent / "tests/vectors/poseidon_perm_width3_bls381.json")
    )
    state_ints = [int(v) for v in vec["input"]]
    want = [int(v) for v in vec["output"]]
    st = limb.pack_mont(spec, np.array([state_ints] * TILE, dtype=object).T)
    out = fence(pk.permute(perm, jax.numpy.asarray(st)))
    got = limb.unpack_mont(spec, out[:, :, 0])
    assert list(got) == want, f"golden mismatch: {got}"
    print("1. naive kernel golden vector OK", flush=True)

    # --- 2. optimized kernel == naive kernel -----------------------------
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
        print(f"2. optimized kernel == naive ({spec2.name}) OK", flush=True)

    # --- 3. poseidon2 kernel vs int oracle -------------------------------
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
    print("3. poseidon2 kernel vs oracle OK", flush=True)

    # --- 4. throughput ----------------------------------------------------
    B = 1 << 16
    n_iters = 50
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
    print(f"4a. classic naive:     {r_naive/1e6:.2f} M perms/s", flush=True)
    r_opt = bench(lambda x: pk.permute_lanes_opt(perm_c, x), lanes)
    print(f"4b. classic optimized: {r_opt/1e6:.2f} M perms/s", flush=True)
    r_p2 = bench(lambda x: pk2.permute_lanes(p2, x), lanes)
    print(f"4c. poseidon2:         {r_p2/1e6:.2f} M perms/s", flush=True)
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


if __name__ == "__main__":
    main()
