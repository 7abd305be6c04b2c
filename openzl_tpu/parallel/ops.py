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


def _pad_msm_inputs(
    curve: CurveSpec, scalars: jnp.ndarray, points_list, multiple: int
):
    """Pad N up to a multiple of `multiple` with zero scalars x identity
    points (doubly inert: zero digits land in discarded bucket 0 AND the
    identity Z=0 is absorbed by the mixed-add masks)."""
    F = jac.field_ops(curve)
    n = scalars.shape[1]
    padded = -(-n // multiple) * multiple
    if padded == n:
        return scalars, points_list
    scalars = jnp.concatenate(
        [
            jnp.asarray(scalars),
            jnp.zeros((scalars.shape[0], padded - n), jnp.uint32),
        ],
        axis=1,
    )
    pad_pts = jac.identity(curve, (padded - n,))
    points_list = [
        JPoint(
            F.concat([p.x, pad_pts.x]),
            F.concat([p.y, pad_pts.y]),
            F.concat([p.z, pad_pts.z]),
        )
        for p in points_list
    ]
    return scalars, points_list


def _reduce_partials(curve: CurveSpec, part: JPoint, axis: str, n_dev: int):
    """all_gather the per-chip partial MSMs and tree-add them (log2 depth).

    O(1) ICI traffic per chip — the classic MSM point-partition reduction.
    The device axis is gathered onto the TRAILING (batch) axis so the limb
    layout jac.add expects (value dims leading) is preserved."""
    gathered = tuple(
        jax.lax.all_gather(v, axis, axis=v.ndim) for v in part
    )  # (n_limbs[,2], *batch, n_dev)
    if n_dev & (n_dev - 1):  # non-pow2 mesh: sequential fold
        acc = JPoint(*(v[..., 0] for v in gathered))
        for i in range(1, n_dev):
            acc = jac.add(curve, acc, JPoint(*(v[..., i] for v in gathered)))
        return tuple(acc)
    live = n_dev
    cur = list(gathered)
    while live > 1:
        half = live // 2
        a = JPoint(*(v[..., :half] for v in cur))
        b = JPoint(*(v[..., half:live] for v in cur))
        cur = list(jac.add(curve, a, b))
        live = half
    return tuple(v[..., 0] for v in cur)


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
    N is padded to a multiple of the mesh size (zero scalars x identities).
    """
    n_dev = mesh.devices.size
    scalars, (points,) = _pad_msm_inputs(curve, scalars, [points], n_dev)

    def local(scal, pts):
        part = msmmod.msm(curve, scal, JPoint(*pts), window_bits, n_bits)
        return _reduce_partials(curve, part, axis, n_dev)

    pspec = P(None, axis) if curve.ext == 1 else P(None, None, axis)
    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), pspec),
            out_specs=P(),
            check_vma=False,  # result is replicated by construction
        )
    )
    scalars = jax.device_put(scalars, NamedSharding(mesh, P(None, axis)))
    points = JPoint(
        *(jax.device_put(v, NamedSharding(mesh, pspec)) for v in points)
    )
    return JPoint(*fn(scalars, tuple(points)))


def sharded_msm_multi(
    curve: CurveSpec,
    mesh: Mesh,
    scalars: jnp.ndarray,
    points_list,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
    axis: str = "data",
):
    """Shared-scalar multi-set MSM (ops.msm.msm_multi) with the POINT axis
    sharded per chip: each chip runs the amortized multi-set Pippenger on
    its point/scalar shard, then the per-chip (S,)-batched partials reduce
    with log2(n_chips) EC adds after one all_gather — the mesh-parallel form
    of the Groth16 prover's a/b1/l dispatch (VERDICT r3 item 1).

    Returns a list of scalar-batch JPoints, one per set (replicated)."""
    F = jac.field_ops(curve)
    n_dev = mesh.devices.size
    n_sets = len(points_list)
    scalars, points_list = _pad_msm_inputs(curve, scalars, points_list, n_dev)
    stacked = JPoint(
        *(
            jnp.stack([getattr(p, f) for p in points_list], axis=F.value_ndim)
            for f in ("x", "y", "z")
        )
    )

    def local(scal, pts):
        outs = msmmod.msm_multi(
            curve,
            scal,
            [
                JPoint(*(jnp.take(v, s, axis=F.value_ndim) for v in pts))
                for s in range(n_sets)
            ],
            window_bits,
            n_bits,
        )
        part = JPoint(  # re-stack set results: batch (S,)
            *(
                jnp.stack([getattr(o, f) for o in outs], axis=-1)
                for f in ("x", "y", "z")
            )
        )
        return _reduce_partials(curve, part, axis, n_dev)

    sspec = (
        P(None, None, axis) if curve.ext == 1 else P(None, None, None, axis)
    )
    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), sspec),
            out_specs=P(),
            check_vma=False,  # replicated by construction
        )
    )
    scalars = jax.device_put(scalars, NamedSharding(mesh, P(None, axis)))
    stacked = JPoint(
        *(jax.device_put(v, NamedSharding(mesh, sspec)) for v in stacked)
    )
    out = JPoint(*fn(scalars, tuple(stacked)))
    return [
        JPoint(out.x[..., s], out.y[..., s], out.z[..., s])
        for s in range(n_sets)
    ]


@functools.lru_cache(maxsize=None)
def _transform_tables(
    spec: FieldSpec, log_n: int, n_dev: int, inverse: bool, coset: bool
):
    """Host-built (twiddle, pre, post) matrices for the sharded four-step
    transform: tw[i, j'] = w^(i*j') (w inverted for iNTT); pre[i, j] =
    g^(j*R+i) (coset-forward input scale); post[i', j'] = g^-(i'*C+j')
    (coset-inverse output scale). All Montgomery-packed (n_limbs, R, C)."""
    n = 1 << log_n
    R, C = n_dev, n // n_dev
    p = spec.modulus
    w = nttmod.group_gen(spec, log_n)
    if inverse:
        w = pow(w, -1, p)

    def geom(first_of_row, step_of_row):
        m = np.empty((R, C), dtype=object)
        for i in range(R):
            acc = first_of_row(i)
            step = step_of_row(i)
            for j in range(C):
                m[i, j] = acc
                acc = acc * step % p
        return limb.pack_mont(spec, m)

    tw = geom(lambda i: 1, lambda i: pow(w, i, p))
    pre = post = None
    if coset:
        g = nttmod.GENERATORS[spec.name]
        if inverse:
            gi = pow(g, -1, p)
            post = geom(lambda i: pow(gi, i * C, p), lambda i: gi)
        else:
            gr = pow(g, R, p)
            pre = geom(lambda i: pow(g, i, p), lambda i: gr)
    return tw, pre, post


def sharded_transform(
    spec: FieldSpec,
    mesh: Mesh,
    coeffs: jnp.ndarray,
    inverse: bool = False,
    coset: bool = False,
    axis: str = "data",
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

    inverse: substitutes w^-1 twiddles and nttmod.intt sub-transforms — the
    sub-intts' 1/C and 1/R scales compose to exactly the full iNTT's 1/N,
    so no separate scaling pass exists. coset: evaluate on g*H (forward:
    pre-scale a_m by g^m) or interpolate from g*H (inverse: post-scale by
    g^-m) — the Groth16 H-polynomial domains, bit-exact with
    ops.ntt.coset_ntt / coset_intt.
    """
    n_dev = mesh.devices.size
    n = coeffs.shape[1]
    assert n % n_dev == 0 and (n & (n - 1)) == 0
    tw, pre, post = _transform_tables(
        spec, n.bit_length() - 1, n_dev, inverse, coset
    )
    sub = nttmod.intt if inverse else nttmod.ntt

    def local(x, twi, *scales):
        # x, twi: (n_limbs, R/n_dev, C) — this chip's rows
        it = iter(scales)
        if pre is not None:
            x = limb.mont_mul(spec, x, next(it))
        y = sub(spec, jnp.swapaxes(x, 1, 2))  # C-point NTTs along j
        y = jnp.swapaxes(y, 1, 2)
        y = limb.mont_mul(spec, y, twi)
        # transpose: split columns, gather rows -> (n_limbs, R, C/n_dev)
        y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1, tiled=True)
        y = sub(spec, y)  # R-point NTTs along i
        if post is not None:
            y = limb.mont_mul(spec, y, next(it))
        return y

    x = coeffs.reshape(spec.n_limbs, n // n_dev, n_dev)  # a[j*R+i] at [j, i]
    x = jnp.swapaxes(x, 1, 2)  # X[i, j]

    row_spec, col_spec = P(None, axis, None), P(None, None, axis)
    row = NamedSharding(mesh, row_spec)
    col = NamedSharding(mesh, col_spec)
    args = [jax.device_put(x, row), jax.device_put(jnp.asarray(tw), row)]
    specs = [row_spec, row_spec]
    if pre is not None:
        args.append(jax.device_put(jnp.asarray(pre), row))
        specs.append(row_spec)
    if post is not None:
        args.append(jax.device_put(jnp.asarray(post), col))
        specs.append(col_spec)
    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=tuple(specs), out_specs=col_spec
        )
    )
    z = fn(*args)  # (n_limbs, R, C) with A[i'*C + j'] = Z[i', j']
    return z.reshape(spec.n_limbs, n)


def sharded_ntt(
    spec: FieldSpec, mesh: Mesh, coeffs: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    return sharded_transform(spec, mesh, coeffs, axis=axis)


def sharded_intt(
    spec: FieldSpec, mesh: Mesh, evals: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    return sharded_transform(spec, mesh, evals, inverse=True, axis=axis)


def sharded_coset_ntt(
    spec: FieldSpec, mesh: Mesh, coeffs: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    return sharded_transform(spec, mesh, coeffs, coset=True, axis=axis)


def sharded_coset_intt(
    spec: FieldSpec, mesh: Mesh, evals: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    return sharded_transform(
        spec, mesh, evals, inverse=True, coset=True, axis=axis
    )
