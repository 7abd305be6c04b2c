"""Component timing of the four-step NTT at 2^18/2^20 on the real TPU.

Chains K iterations inside one jit to amortize the ~30 ms axon dispatch
overhead (experiments/rowshuffle_probe.py measured it); reports per-iter.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from openzl_tpu.fields.spec import BLS12_381_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.ops import ntt_kernel

spec = BLS12_381_FR
n = spec.n_limbs
rng = np.random.default_rng(3)
K = 4


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:28s} {dt * 1e3:8.2f} ms/iter", flush=True)


for log_n in (18,):
    N = 1 << log_n
    x = rng.integers(0, 1 << 16, size=(n, N), dtype=np.uint32)
    x[-1] &= 0x3FFF
    xd = jax.device_put(x)
    tables = nttmod._fourstep_tables(spec, log_n, False, ntt_kernel._M_MAX)
    nodes, perm, _ = tables

    @jax.jit
    def full(v):
        for _ in range(K):
            v = nttmod._apply_node(spec, v.reshape(n, N, 1), nodes, False)
            v = jnp.take(v, perm, axis=1).reshape(n, N)
        return v

    @jax.jit
    def noperm(v):
        for _ in range(K):
            v = nttmod._apply_node(spec, v.reshape(n, N, 1), nodes, False).reshape(n, N)
        return v

    @jax.jit
    def permonly(v):
        for _ in range(K):
            v = jnp.take(v, perm, axis=1)
        return v

    m = ntt_kernel._M_MAX
    stage_tw = nodes[0]

    @jax.jit
    def kernels_only(v):
        # the column kernels alone: logN/log(m) passes, no twiddle/transpose
        for _ in range(K):
            for _lvl in range(max(1, log_n // m.bit_length() - 0) // 1):
                pass
            v2 = v.reshape(n, m, N // m)
            for _lvl in range(-(-log_n // (m.bit_length() - 1))):
                v2 = ntt_kernel.small_ntt(spec, v2, stage_tw)
            v = v2.reshape(n, N)
        return v

    @jax.jit
    def transposes_only(v):
        for _ in range(K):
            lvls = -(-log_n // (m.bit_length() - 1)) - 1
            for _lvl in range(lvls):
                v = v.reshape(n, m, N // m).transpose(0, 2, 1).reshape(n, N)
        return v

    @jax.jit
    def twiddles_only(v):
        for _ in range(K):
            lvls = -(-log_n // (m.bit_length() - 1)) - 1
            for _lvl in range(lvls):
                v = ntt_kernel.mont_mul(spec, v, v)
        return v

    print(f"--- 2^{log_n} (K={K}) ---", flush=True)
    timeit("full (noperm+perm)", full, xd)
    timeit("noperm", noperm, xd)
    timeit("perm gather only", permonly, xd)
    timeit("column kernels only", kernels_only, xd)
    timeit("transposes only", transposes_only, xd)
    timeit("twiddle muls only", twiddles_only, xd)
