"""Probe: does Mosaic accept sublane-axis stack+reshape (row interleave),
static strided row slicing, and (n, A, 128) blocks inside one kernel?
Also: single pallas_call dispatch overhead on the axon relay.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, L = 64, 128
n = 16


def kernel(x_ref, o_ref):
    x = x_ref[...]  # (n, A, L)
    # 1: split halves on the row (sublane-ish) axis
    u, t = x[:, : A // 2], x[:, A // 2 :]
    lo = u + t
    hi = u - t
    # 2: interleave rows via stack + reshape (lanes untouched)
    y = jnp.stack([lo, hi], axis=2).reshape(n, A, L)
    # 3: static strided row slice
    z = y[:, ::2] + y[:, 1::2]
    o_ref[...] = jnp.concatenate([z, z], axis=1)


x = jnp.asarray(np.arange(n * A * L, dtype=np.uint32).reshape(n, A, L))
try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, A, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    xs = np.asarray(x)
    u, t = xs[:, : A // 2], xs[:, A // 2 :]
    y = np.stack([u + t, u - t], axis=2).reshape(n, A, L)
    z = y[:, ::2] + y[:, 1::2]
    want = np.concatenate([z, z], axis=1)
    print("row shuffle kernel:", "OK" if (np.asarray(out) == want).all() else "WRONG")
except Exception as e:
    print("row shuffle kernel FAILED:", str(e)[:500])


# dispatch overhead: time k chained trivial pallas_calls vs 2k
def chain(k):
    def tiny(x_ref, o_ref):
        o_ref[...] = x_ref[...] + np.uint32(1)

    @jax.jit
    def run(v):
        for _ in range(k):
            v = pl.pallas_call(
                tiny,
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(v)
        return v

    big = jnp.zeros((16, 1024, 128), jnp.uint32)  # 8 MB
    np.asarray(run(big)[0, 0, :1])
    t0 = time.perf_counter()
    np.asarray(run(big)[0, 0, :1])
    return time.perf_counter() - t0


t10, t40 = chain(10), chain(40)
print(
    f"10 calls {t10 * 1e3:.2f} ms, 40 calls {t40 * 1e3:.2f} ms -> "
    f"{(t40 - t10) / 30 * 1e3:.3f} ms per 8MB r+w pallas call",
    flush=True,
)
