"""Probe: which in-kernel DIF stage structures does Mosaic compile?

DIF keeps butterfly results in place (lo at i, hi at i+h), so no interleave
is needed — but each stage still needs to pair rows i and i+h on the
sublane axis. Candidate lowerings:
  A. reshape (n, M, L) -> (n, b, 2, h, L), index halves, stack+reshape back
  B. python-unrolled static slices + concat per block
  C. pltpu.roll on the sublane axis + where(mask)
Each is checked against a numpy oracle (adds only — structure, not math).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, M, L = 4, 512, 128
LOG_M = 9


def oracle(x):
    x = x.copy().astype(np.uint32)
    for s in range(LOG_M):
        h = M >> (s + 1)
        y = x.reshape(n, M // (2 * h), 2, h, L)
        u, t = y[:, :, 0].copy(), y[:, :, 1].copy()
        y[:, :, 0] = u + t
        y[:, :, 1] = u - t + np.uint32(s)  # stand-in for twiddle mul
        x = y.reshape(n, M, L)
    return x


def kernel_A(x_ref, o_ref):
    x = x_ref[...]
    for s in range(LOG_M):
        h = M >> (s + 1)
        y = x.reshape(n, M // (2 * h), 2, h, L)
        u, t = y[:, :, 0], y[:, :, 1]
        lo = u + t
        hi = u - t + np.uint32(s)
        x = jnp.stack([lo, hi], axis=2).reshape(n, M, L)
    o_ref[...] = x


def kernel_C(x_ref, o_ref):
    x = x_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.uint32, (1, M, 1), 1)
    for s in range(LOG_M):
        h = M >> (s + 1)
        up = pltpu.roll(x, -h, 1)
        down = pltpu.roll(x, h, 1)
        first = (iota & h) == 0
        x = jnp.where(first, x + up, down - x + np.uint32(s))
    o_ref[...] = x


x0 = np.arange(n * M * L, dtype=np.uint32).reshape(n, M, L)
want = oracle(x0)
xd = jnp.asarray(x0)

for name, kern in [("A reshape", kernel_A), ("C roll", kernel_C)]:
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, M, L), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xd)
        ok = (np.asarray(out) == want).all()
        print(f"{name}: {'OK' if ok else 'WRONG'} "
              f"({time.perf_counter() - t0:.1f}s compile+run)", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:300]}", flush=True)
