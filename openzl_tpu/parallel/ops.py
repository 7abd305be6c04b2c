"""Sharded kernels: multi-chip Poseidon, MSM, and NTT over a device mesh.

The scaling axes follow SURVEY.md section 2.9's mapping: hash batches and
MSM points shard data-parallel (per-chip partial results reduced over ICI);
the NTT decomposes as a 2-D four-step transform so the inter-chip exchange
is a single all_to_all between two locally-batched NTT passes.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves import jacobian as jac
from ..curves.jacobian import JPoint
from ..curves.spec import CurveSpec
from ..fields import limb
from ..fields.spec import FieldSpec
from ..ops import msm as msmmod
from ..ops import ntt as nttmod


def sharded_poseidon_hash(perm, mesh: Mesh, inputs, axis: str = "data"):
    """Batched Poseidon hash with the batch axis sharded over `mesh`.

    inputs: (n_limbs, arity, batch) with batch divisible by mesh size.
    Pure dp — no collectives; XLA keeps every chip on its shard.
    """
    fn = jax.jit(
        jax.shard_map(
            perm.hash,
            mesh=mesh,
            in_specs=(P(None, None, axis),),
            out_specs=P(None, axis),
        )
    )
    inputs = jax.device_put(inputs, NamedSharding(mesh, P(None, None, axis)))
    return fn(inputs)


def sharded_msm(
    curve: CurveSpec,
    mesh: Mesh,
    scalars: jnp.ndarray,
    points: JPoint,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
    axis: str = "data",
) -> JPoint:
    """MSM with points/scalars sharded per chip.

    Each chip runs the full Pippenger pipeline on its shard (MSM distributes
    over point partitions), then the per-chip partials are combined with
    log2(n_chips) EC adds after an all_gather over ICI — O(1) traffic.
    """
    n_dev = mesh.devices.size

    def local(scal, pts):
        part = msmmod.msm(curve, scal, JPoint(*pts), window_bits, n_bits)
        gathered = tuple(
            jax.lax.all_gather(v, axis) for v in part
        )  # (n_dev, n_limbs[,2])
        acc = JPoint(*(v[0] for v in gathered))
        for i in range(1, n_dev):
            acc = jac.add(curve, acc, JPoint(*(v[i] for v in gathered)))
        return tuple(acc)

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis) if curve.ext == 1 else P(None, None, axis)),
            out_specs=P(),
            check_vma=False,  # result is replicated by construction
        )
    )
    pspec = P(None, axis) if curve.ext == 1 else P(None, None, axis)
    scalars = jax.device_put(scalars, NamedSharding(mesh, P(None, axis)))
    points = JPoint(
        *(jax.device_put(v, NamedSharding(mesh, pspec)) for v in points)
    )
    return JPoint(*fn(scalars, tuple(points)))


def sharded_ntt(
    spec: FieldSpec, mesh: Mesh, coeffs: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    """Four-step (Bailey) NTT of size N = R*C sharded over `mesh`, R = n_chips.

    With input matrix X[i, j] = a[j*R + i]:
      1. length-C NTTs along j, one row i per chip            (local)
      2. twiddle by w^(i*j')                                  (local)
      3. global transpose: one all_to_all over ICI
      4. length-R NTTs along i, batched over local columns    (local)
    Output A[i'*C + j'] = Z[i', j'] — natural order, bit-exact with
    nttmod.ntt. The all_to_all is the ONLY inter-chip traffic (SURVEY.md
    section 7 step 5's decomposition).

    The sub-transform roots come out right automatically: a length-m
    nttmod.ntt uses w_m = w^(N/m) (ark-poly's derivation is per-size).
    """
    n_dev = mesh.devices.size
    n = coeffs.shape[1]
    assert n % n_dev == 0 and (n & (n - 1)) == 0
    R, C = n_dev, n // n_dev
    p = spec.modulus
    w = nttmod.group_gen(spec, n.bit_length() - 1)

    # twiddle matrix w^(i*j'), Montgomery form, sharded like X over rows i
    tw = np.empty((R, C), dtype=object)
    for i in range(R):
        base = pow(w, i, p)
        acc = 1
        for j in range(C):
            tw[i, j] = acc
            acc = acc * base % p
    tw_m = jnp.asarray(limb.pack_mont(spec, tw))  # (n_limbs, R, C)

    def local(x, twi):
        # x, twi: (n_limbs, 1, C) — this chip's row
        y = nttmod.ntt(spec, jnp.swapaxes(x, 1, 2))  # C-point NTT along j
        y = jnp.swapaxes(y, 1, 2)
        y = limb.mont_mul(spec, y, twi)
        # transpose: split columns, gather rows -> (n_limbs, R, C/n_dev)
        y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1, tiled=True)
        return nttmod.ntt(spec, y)  # R-point NTTs along i

    x = coeffs.reshape(spec.n_limbs, C, R)  # a[j*R + i] at [j, i]
    x = jnp.swapaxes(x, 1, 2)  # X[i, j]

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None)),
            out_specs=P(None, None, axis),
        )
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    tw_m = jax.device_put(tw_m, NamedSharding(mesh, P(None, axis, None)))
    z = fn(x, tw_m)  # (n_limbs, R, C) with A[i'*C + j'] = Z[i', j']
    return z.reshape(spec.n_limbs, n)
