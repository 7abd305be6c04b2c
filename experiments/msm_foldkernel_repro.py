"""Repro matrix for the fused fold-kernel miscompile (round 5).

The fused Pallas gather-fold kernel (ops/ec_kernel.fold_madd) returns
corrupted bucket totals when compiled inside the production MSM graph on
the real TPU (axon backend), which is why `ops.msm._FOLD_KERNEL_MODE`
defaults to "off". This script reproduces the full evidence matrix on a
TPU host:

  config                                                      result
  -----------------------------------------------------------------
  real _msm_jit, ungrouped path, kernel on                    WRONG
  real _msm_jit, ungrouped path, kernel off (jnp fold)        ok
  real _bucket_totals_fast jitted over (pts, rows, digits)
      args, kernel on vs off                                  WRONG
      (deterministic; ~60% of buckets are different group
      elements, not alternate Jacobian representatives)
  fold_madd standalone, random operands                       ok
  fold_madd standalone, captured real pipeline operands       ok
  fold_madd embedded in a jit computing operands in-graph     ok
  ... + lax.optimization_barrier around the custom call       WRONG
      (barrier inside the real graph does NOT fix it)
  every config above in interpret mode / on CPU               ok

The discriminating variable is the kernel's operands arriving as JIT
PARAMETERS (the production `_msm_jit(curve, scalars, points, ...)`
signature): in-graph operands are fine, parameter-fed operands corrupt,
and fusion barriers do not help — pointing at XLA parameter-layout
assignment interacting with the Mosaic custom call's layout constraints
through the axon PJRT backend rather than at the kernel logic.

Run: python experiments/msm_foldkernel_repro.py   (needs the TPU)
"""

import functools
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

import jax.numpy as jnp

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import BLS12_381_G1
from openzl_tpu.fields import limb
from openzl_tpu.ops import ec_kernel
from openzl_tpu.ops import msm as msmmod
from openzl_tpu.ref import curve as refc


def main():
    curve = BLS12_381_G1
    spec = curve.scalar
    rng = random.Random(7)
    n = 1 << 13
    c = 12
    gen = refc.generator(curve)
    dlogs = [rng.randrange(1 << 30) for _ in range(n)]
    pts_host = [refc.scalar_mul(curve, d, gen) for d in dlogs]
    pts0 = jac.from_affine_ints(curve, pts_host)
    sc = [rng.randrange(spec.modulus) for _ in range(n)]
    sk = jnp.asarray(limb.pack(spec, np.array(sc, dtype=object)))
    want = sum(s * d for s, d in zip(sc, dlogs)) % spec.modulus
    wantpt = refc.scalar_mul(curve, want, gen)

    def msm_check(tag):
        msmmod._msm_jit._jitted.clear_cache()
        out = jac.to_affine_ints(curve, msmmod.msm(curve, sk, pts0))
        print(f"{tag}: {'ok' if out == wantpt else 'WRONG'}", flush=True)

    msmmod._GROUP_DISABLE_N = 0  # force the flagship-size ungrouped path
    msmmod._FOLD_KERNEL_MODE = "on"
    msm_check("real msm, ungrouped, kernel on")
    msmmod._FOLD_KERNEL_MODE = "off"
    msm_check("real msm, ungrouped, kernel off")

    # standalone kernel on captured real operands (known-good cell)
    @functools.partial(jax.jit, static_argnums=(0, 2))
    def capture(curve, sk, c, pts):
        pts = jac.normalize(curve, pts)
        rows = msmmod._rows_of_points(curve, pts, gather_z=False)
        d = msmmod._digits(sk, 0, c)
        d = jnp.where(jac.field_ops(curve).is_zero(pts.z), 0, d)
        idx_bits = max(1, (n - 1).bit_length())
        packed = (d.astype(jnp.uint32) << jnp.uint32(idx_bits)) | jnp.arange(
            n, dtype=jnp.uint32
        )
        ps = jnp.sort(packed, axis=-1)
        order = (ps & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        sd = (ps >> jnp.uint32(idx_bits)).astype(jnp.int32)
        starts = sd != jnp.concatenate([jnp.full((1,), -1, sd.dtype), sd[:-1]])
        r = 32
        l = n // r

        def rt(v):
            return jnp.moveaxis(v.reshape(v.shape[:-1] + (l, r)), -1, -2)

        sp = msmmod._gather_rows(curve, pts, rows, rt(order), skip_z=True)
        return sp.x, sp.y, rt(starts)

    cx, cy, st2 = (np.asarray(v) for v in capture(curve, sk, c, pts0))
    args = (jnp.asarray(st2), (jnp.asarray(cx), jnp.asarray(cy)))
    bi, ti = ec_kernel.fold_madd(curve.base, *args, skip_z=True, interpret=True)
    bc, tc = ec_kernel.fold_madd(curve.base, *args, skip_z=True)
    ok = all(
        (np.asarray(a) == np.asarray(b)).all() for a, b in zip(bi + ti, bc + tc)
    )
    print(
        "fold_madd standalone on captured operands:",
        "ok" if ok else "WRONG",
        flush=True,
    )


if __name__ == "__main__":
    main()
