"""Batched, branch-free Jacobian point arithmetic, generic over the
coordinate field (Fq for G1, Fq2 for G2).

TPU-first design: points are (X, Y, Z) Montgomery limb arrays of shape
(n_limbs[, 2], *batch); the group law is evaluated for the whole batch with
all special cases (identity, doubling, inverse pair) resolved by masks — no
data-dependent control flow, so everything jits and shards. Identity is
Z = 0 (any X, Y).

Formulas: dbl-2009-l and add-2007-bl (a = 0 curves), the same complexity
class arkworks' projective arithmetic uses (SURVEY.md section 2.8 ark-ec).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import limb
from ..fields.ext import FieldOps, fq2_ops, fq_ops
from ..fields.spec import FieldSpec, LIMB_BITS
from .spec import CurveSpec


class JPoint(NamedTuple):
    """Jacobian point batch; affine = (X/Z^2, Y/Z^3), identity Z=0."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.z.shape[1:]


def field_ops(curve: CurveSpec) -> FieldOps:
    return (
        fq2_ops(curve.base, curve.nr2) if curve.ext == 2 else fq_ops(curve.base)
    )


def _batch_shape(curve: CurveSpec, P: JPoint):
    return P.z.shape[field_ops(curve).value_ndim :]


def identity(curve: CurveSpec, batch_shape=()) -> JPoint:
    F = field_ops(curve)
    one = F.one(batch_shape)
    return JPoint(one, one, F.zeros(batch_shape))


def from_affine_ints(curve: CurveSpec, points) -> JPoint:
    """Host-side: list of (x, y) | None -> batched Jacobian point (Z=1/0).

    Coordinates are ints for G1 and (c0, c1) pairs for G2.
    """
    F = field_ops(curve)
    zero = 0 if curve.ext == 1 else (0, 0)
    one = 1 if curve.ext == 1 else (1, 0)
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(one)
            ys.append(one)
            zs.append(zero)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(one)
    return JPoint(
        jnp.asarray(F.from_ints(np.array(xs, dtype=object))),
        jnp.asarray(F.from_ints(np.array(ys, dtype=object))),
        jnp.asarray(F.from_ints(np.array(zs, dtype=object))),
    )


def to_affine_ints(curve: CurveSpec, P: JPoint):
    """Device -> host: list of (x, y) | None (batch 1-D or scalar)."""
    F = field_ops(curve)
    single = P.z.ndim == F.value_ndim
    zinv = F.inv(P.z)
    zinv2 = F.sqr(zinv)
    zinv3 = F.mul(zinv2, zinv)
    xs = F.to_ints(np.asarray(F.mul(P.x, zinv2)))
    ys = F.to_ints(np.asarray(F.mul(P.y, zinv3)))
    inf = np.asarray(F.is_zero(P.z))

    def fmt(c):
        return int(c) if curve.ext == 1 else (int(c[0]), int(c[1]))

    if single:
        return None if bool(inf) else (fmt(xs), fmt(ys))
    return [
        None if inf[i] else (fmt(xs[i]), fmt(ys[i])) for i in range(len(inf))
    ]


def select(mask: jnp.ndarray, a: JPoint, b: JPoint, F: FieldOps = None) -> JPoint:
    sel = (
        F.select
        if F is not None
        else (lambda m, u, v: jnp.where(m[(None,) * (u.ndim - m.ndim)], u, v))
    )
    return JPoint(sel(mask, a.x, b.x), sel(mask, a.y, b.y), sel(mask, a.z, b.z))


def is_identity(curve: CurveSpec, P: JPoint) -> jnp.ndarray:
    return field_ops(curve).is_zero(P.z)


def negate(curve: CurveSpec, P: JPoint) -> JPoint:
    return JPoint(P.x, field_ops(curve).neg(P.y), P.z)


def _pallas_ec(curve: CurveSpec) -> bool:
    """Route group ops through the Pallas EC kernels on TPU (Fq for G1,
    Karatsuba-Fq2 for G2 — ops/ec_kernel.py).

    Decided at trace time: tests pin the CPU platform, production runs pin
    the TPU backend, so one branch per process.
    """
    if curve.ext not in (1, 2):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend query can fail pre-init in exotic setups
        return False


@functools.partial(jax.jit, static_argnums=0)
def double(curve: CurveSpec, P: JPoint) -> JPoint:
    """dbl-2009-l for a = 0; the generic-a Jacobian double (M = 3X^2 +
    a Z^4) for every other short-Weierstrass config (the MNT-family curve
    shapes the reference ships — plugins/arkworks/Cargo.toml:60-67 — have
    a != 0). Both handle identity for free (Z3 = 2YZ = 0)."""
    if _pallas_ec(curve):
        from ..ops import ec_kernel

        return JPoint(
            *ec_kernel.ec_op(
                curve.base, "dbl", P.x, P.y, P.z, ext=curve.ext,
                beta=curve.nr2, a=curve.a,
            )
        )
    F = field_ops(curve)
    X, Y, Z = P
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    D = F.double(F.sub(F.sqr(F.add(X, B)), F.add(A, C)))  # 4XY^2
    E = F.add(F.double(A), A)  # 3A
    if curve.a != 0:
        ZZ = F.sqr(Z)
        a_c = F.const(curve.a, Z.ndim - F.value_ndim)
        E = F.add(E, F.mul(a_c, F.sqr(ZZ)))  # M = 3X^2 + a Z^4
    X3 = F.sub(F.sqr(E), F.double(D))
    C8 = F.double(F.double(F.double(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    Z3 = F.double(F.mul(Y, Z))
    return JPoint(X3, Y3, Z3)


@functools.partial(jax.jit, static_argnums=0)
def add(curve: CurveSpec, P: JPoint, Q: JPoint) -> JPoint:
    """Complete batched addition: add-2007-bl with masked special cases."""
    if _pallas_ec(curve):
        from ..ops import ec_kernel

        bx, by, bz = jnp.broadcast_arrays(P.x, Q.x), jnp.broadcast_arrays(
            P.y, Q.y
        ), jnp.broadcast_arrays(P.z, Q.z)
        return JPoint(
            *ec_kernel.ec_op(
                curve.base,
                "add",
                bx[0], by[0], bz[0], bx[1], by[1], bz[1],
                ext=curve.ext,
                beta=curve.nr2,
                a=curve.a,
            )
        )
    F = field_ops(curve)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    I = F.sqr(F.double(H))
    J = F.mul(H, I)
    r = F.double(F.sub(S2, S1))
    V = F.mul(U1, I)
    X3 = F.sub(F.sqr(r), F.add(J, F.double(V)))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(S1, J)))
    zz = F.sub(F.sqr(F.add(Z1, Z2)), F.add(Z1Z1, Z2Z2))
    Z3 = F.mul(zz, H)
    R = JPoint(X3, Y3, Z3)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(r)
    both_live = ~p_inf & ~q_inf
    same = both_live & h_zero & r_zero  # P == Q -> double
    opposite = both_live & h_zero & ~r_zero  # P == -Q -> identity

    R = select(same, double(curve, P), R, F)
    R = select(opposite, identity(curve, _batch_shape(curve, P)), R, F)
    R = select(p_inf, Q, R, F)
    R = select(q_inf, P, R, F)
    return R


@functools.partial(jax.jit, static_argnums=0)
def madd(curve: CurveSpec, P: JPoint, Q: JPoint) -> JPoint:
    """Mixed batched addition: Q must be normalized (Z in {0, 1}).

    madd-2007-bl (7M+4S vs add-2007-bl's 11M+5S); Q with Z=0 (identity) is
    handled by the q_inf mask, so `normalize` output feeds straight in. Used
    by the MSM bucket pipeline where one operand is always an input point.
    """
    if _pallas_ec(curve):
        from ..ops import ec_kernel

        bx, by, bz = jnp.broadcast_arrays(P.x, Q.x), jnp.broadcast_arrays(
            P.y, Q.y
        ), jnp.broadcast_arrays(P.z, Q.z)
        return JPoint(
            *ec_kernel.ec_op(
                curve.base,
                "madd",
                bx[0], by[0], bz[0], bx[1], by[1], bz[1],
                ext=curve.ext,
                beta=curve.nr2,
                a=curve.a,
            )
        )
    F = field_ops(curve)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(X2, Z1Z1)
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, X1)
    HH = F.sqr(H)
    I = F.double(F.double(HH))
    J = F.mul(H, I)
    r = F.double(F.sub(S2, Y1))
    V = F.mul(X1, I)
    X3 = F.sub(F.sqr(r), F.add(J, F.double(V)))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(Y1, J)))
    Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)
    R = JPoint(X3, Y3, Z3)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(r)
    both_live = ~p_inf & ~q_inf
    same = both_live & h_zero & r_zero
    opposite = both_live & h_zero & ~r_zero

    R = select(same, double(curve, P), R, F)
    R = select(opposite, identity(curve, _batch_shape(curve, P)), R, F)
    R = select(p_inf, Q, R, F)
    R = select(q_inf, P, R, F)
    return R


def batch_inv(F: FieldOps, x: jnp.ndarray) -> jnp.ndarray:
    """Batched field inversion over the LAST axis: Montgomery's trick.

    Two mul-monoid chunked scans (prefix and suffix products) + ONE Fermat
    inversion of the grand total: ~7 field muls per element instead of the
    ~2*log2(p) a per-element Fermat inverse costs. All inputs must be
    non-zero (callers mask zeros to 1 beforehand).
    """
    from ..ops.scan_utils import inclusive_scan

    n = x.shape[-1]
    if n == 1:
        return F.inv(x)
    batch = x.shape[F.value_ndim :]

    def combine(a, b):
        return (F.mul(a[0], b[0]),)

    def pad(k):
        return (F.broadcast_to_batch(F.one((1,) * (len(batch) - 1) + (1,)), batch[:-1] + (k,)),)

    (ps,) = inclusive_scan(combine, (x,), pad)
    (ssr,) = inclusive_scan(combine, (F.reverse(x),), pad)
    ss = F.reverse(ssr)
    tinv = F.inv(F.take(ps, n - 1))  # one Fermat, single lane
    left = F.concat([*pad(1), F.slice_batch(ps, 0, n - 1)])
    right = F.concat([F.slice_batch(ss, 1, n), *pad(1)])
    tinv_b = F.broadcast_to_batch(tinv.reshape(tinv.shape + (1,)), batch)
    return F.mul(F.mul(left, right), tinv_b)


@functools.partial(jax.jit, static_argnums=0)
def normalize(curve: CurveSpec, P: JPoint) -> JPoint:
    """Scale every live point to Z = 1 (identity keeps Z = 0, X = Y = 1).

    One batched inversion for the whole batch; output satisfies `madd`'s
    Z-in-{0,1} precondition and makes every downstream mixed add cheaper.
    """
    F = field_ops(curve)
    batch = _batch_shape(curve, P)
    if not batch:
        raise ValueError("normalize expects a batched point")
    inf = F.is_zero(P.z)
    one = F.broadcast_to_batch(F.one((1,) * len(batch)), batch)
    z = F.select(inf, one, P.z)
    zinv = batch_inv(F, z)
    zi2 = F.sqr(zinv)
    x = F.mul(P.x, zi2)
    y = F.mul(P.y, F.mul(zi2, zinv))
    return JPoint(
        F.select(inf, one, x),
        F.select(inf, one, y),
        F.select(inf, F.zeros(batch), one),
    )


def scalar_bits(spec_scalar: FieldSpec, scalars_canonical: jnp.ndarray) -> jnp.ndarray:
    """(n_limbs, *batch) canonical scalars -> (bits, *batch) bool, LSB first."""
    n_bits = spec_scalar.bits
    rows = []
    for i in range(n_bits):
        word = scalars_canonical[i // LIMB_BITS]
        rows.append(((word >> (i % LIMB_BITS)) & 1).astype(bool))
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul(curve: CurveSpec, scalars_canonical: jnp.ndarray, P: JPoint) -> JPoint:
    """Batched variable-base double-and-add: k_i * P_i elementwise.

    scalars_canonical: (n_limbs_scalar, *batch) canonical (non-Montgomery).
    lax.scan over bits (LSB first): acc += bit ? addend : 0; addend doubles.
    """
    F = field_ops(curve)
    bits = scalar_bits(curve.scalar, scalars_canonical)
    acc = identity(curve, _batch_shape(curve, P))

    def body(carry, bit):
        acc, addend = carry
        acc = select(bit, add(curve, acc, addend), acc, F)
        addend = double(curve, addend)
        return (acc, addend), None

    (acc, _), _ = lax.scan(body, (acc, P), bits)
    return acc


def generator(curve: CurveSpec, batch_shape=()) -> JPoint:
    F = field_ops(curve)
    gx = F.const(curve.gen_x, len(batch_shape))
    gy = F.const(curve.gen_y, len(batch_shape))
    return JPoint(
        F.broadcast_to_batch(gx, batch_shape),
        F.broadcast_to_batch(gy, batch_shape),
        F.one(batch_shape),
    )


@functools.partial(jax.jit, static_argnums=0)
def is_on_curve(curve: CurveSpec, P: JPoint) -> jnp.ndarray:
    """Jacobian curve check: Y^2 = X^3 + a X Z^4 + b Z^6; identity passes."""
    F = field_ops(curve)
    y2 = F.sqr(P.y)
    x3 = F.mul(F.sqr(P.x), P.x)
    z2 = F.sqr(P.z)
    z6 = F.mul(F.sqr(z2), z2)
    b = F.const(curve.b, len(_batch_shape(curve, P)))
    rhs = F.add(x3, F.mul(b, z6))
    if curve.a != 0:
        a_c = F.const(curve.a, len(_batch_shape(curve, P)))
        rhs = F.add(rhs, F.mul(a_c, F.mul(P.x, F.sqr(z2))))
    return F.eq(y2, rhs) | F.is_zero(P.z)
