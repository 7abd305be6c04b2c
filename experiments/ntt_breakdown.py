"""Per-component timing of the kernel NTT stage at 2^18 on the real TPU.

Variants (math-invalid ones are timing-only):
  full      - the real _ntt_core path
  nogather  - twiddle = static slice of the table (no dynamic gather)
  nointer   - skip the interleave stack/reshape (concat halves instead)
  kernelonly- butterfly kernel alone on static operands, x20 stages
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
from jax import lax

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.ops import ntt_kernel

spec = BLS12_381_FR
LOG_N = 18
N = 1 << LOG_N
HALF = N // 2
rng = np.random.default_rng(3)
x = rng.integers(0, 1 << 16, size=(spec.n_limbs, N), dtype=np.uint32)
x[-1] &= 0x3FFF
xd = jax.device_put(x)

rev, table, n_inv = nttmod._plan(spec, LOG_N, False)
table_d = jax.device_put(jnp.asarray(table))
iota = jnp.arange(HALF, dtype=jnp.int32)


def run(name, fn, arg):
    out = fn(arg)
    np.asarray(out[0, :1])
    t0 = time.perf_counter()
    out = fn(arg)
    np.asarray(out[0, :1])
    print(f"{name:12s} {(time.perf_counter() - t0) * 1e3:8.1f} ms", flush=True)


@jax.jit
def full(xc):
    def stage(c, s):
        u, t = c[:, :HALF], c[:, HALF:]
        e = iota & ~(jnp.left_shift(jnp.int32(1), s) - 1)
        tw = table_d[:, e]
        lo, hi = ntt_kernel.butterfly(spec, u, t, tw)
        return jnp.stack([lo, hi], axis=2).reshape(spec.n_limbs, N), None

    c, _ = lax.scan(stage, xc, jnp.arange(LOG_N, dtype=jnp.int32))
    return jnp.take(c, jnp.asarray(rev), axis=1)


@jax.jit
def nogather(xc):
    def stage(c, s):
        u, t = c[:, :HALF], c[:, HALF:]
        tw = table_d  # static full-table read, no gather
        lo, hi = ntt_kernel.butterfly(spec, u, t, tw)
        return jnp.stack([lo, hi], axis=2).reshape(spec.n_limbs, N), None

    c, _ = lax.scan(stage, xc, jnp.arange(LOG_N, dtype=jnp.int32))
    return jnp.take(c, jnp.asarray(rev), axis=1)


@jax.jit
def nointer(xc):
    def stage(c, s):
        u, t = c[:, :HALF], c[:, HALF:]
        e = iota & ~(jnp.left_shift(jnp.int32(1), s) - 1)
        tw = table_d[:, e]
        lo, hi = ntt_kernel.butterfly(spec, u, t, tw)
        return jnp.concatenate([lo, hi], axis=1), None

    c, _ = lax.scan(stage, xc, jnp.arange(LOG_N, dtype=jnp.int32))
    return c


@jax.jit
def kernelonly(xc):
    u, t = xc[:, :HALF], xc[:, HALF:]

    def stage(c, s):
        lo, hi = ntt_kernel.butterfly(spec, c[0], c[1], table_d)
        return (lo, hi), None

    (lo, hi), _ = lax.scan(
        stage, (u, t), jnp.arange(LOG_N, dtype=jnp.int32)
    )
    return lo


@jax.jit
def gatheronly(xc):
    def stage(c, s):
        e = iota & ~(jnp.left_shift(jnp.int32(1), s) - 1)
        tw = table_d[:, e]
        return c.at[:, :HALF].set(tw), None

    c, _ = lax.scan(stage, xc, jnp.arange(LOG_N, dtype=jnp.int32))
    return c


@jax.jit
def interonly(xc):
    def stage(c, s):
        u, t = c[:, :HALF], c[:, HALF:]
        return jnp.stack([u, t], axis=2).reshape(spec.n_limbs, N), None

    c, _ = lax.scan(stage, xc, jnp.arange(LOG_N, dtype=jnp.int32))
    return c


run("full", full, xd)
run("nogather", nogather, xd)
run("nointer", nointer, xd)
run("kernelonly", kernelonly, xd)
run("gatheronly", gatheronly, xd)
run("interonly", interonly, xd)
