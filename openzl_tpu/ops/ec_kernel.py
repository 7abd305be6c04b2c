"""Pallas TPU kernels for batched Jacobian EC point ops (Fq curves, G1).

Why a kernel: the jnp EC path evaluates each limb step as a separate XLA op
over the batch — with `mont_mul_compact`'s 48 sequential scan steps per
field mul, an EC add is ~latency-bound, two orders below the VPU montmul
ceiling. Here each grid step loads a batch tile of points into VMEM and
runs the WHOLE group-law formula in-core (fully unrolled 16-bit-limb
Montgomery arithmetic, Python-list column registers), so the only HBM
traffic is one read of the operands and one write of the result; at 24
limbs the kernels are compute-bound (~6% of time in HBM traffic at width
2048).

Formulas and special-case mask semantics mirror `curves.jacobian`
(dbl-2009-l / add-2007-bl / madd-2007-bl, identity = Z 0) so the oracle
tests cover both paths. Limb helpers are shared with the Poseidon kernel
(`ops.poseidon_kernel`), which documents the lazy-u32-column overflow
analysis. The modulus is a kernel operand shaped (n, 1, 1) — Pallas
forbids captured array constants, and broadcast dims must be added
host-side (1-D to 3-D reshapes are unsupported shape casts in Mosaic).

Replaces arkworks' CPU projective arithmetic in the MSM/Groth16 hot path
(SURVEY.md section 2.8 ark-ec).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.spec import FieldSpec
from .poseidon_kernel import _cond_sub_p, _k_add, _k_mont_mul, _k_mont_sqr, _sub_raw

_LANES = 128
#: batch-tile sublanes: 9-11 live (24, S, 128) u32 buffers per EC op must
#: fit VMEM with double buffering; S=16 keeps peak usage ~6 MB at 24 limbs.
_SUBLANES = 16


def _k_sub(p, a, b):
    """Modular subtract: a - b, add p back where the raw subtract borrowed."""
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _sub_raw(a, b)
    pb = jnp.broadcast_to(p, d.shape)
    outs = []
    carry = jnp.zeros_like(d[0])
    for i in range(d.shape[0]):
        t = d[i] + pb[i] + carry
        outs.append(t & np.uint32(0xFFFF))
        carry = t >> np.uint32(16)
    added = jnp.stack(outs)
    return jnp.where(borrow.astype(bool)[None], added, d)


def _k_double(p, a):
    return _cond_sub_p(p, _raw_add_nored(a, a))


def _raw_add_nored(a, b):
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        c = a[i] + b[i] + carry
        outs.append(c & np.uint32(0xFFFF))
        carry = c >> np.uint32(16)
    return jnp.stack(outs)


def _k_is_zero(v):
    m = v[0] == 0
    for i in range(1, v.shape[0]):
        m &= v[i] == 0
    return m


def _k_select(mask, a, b):
    return jnp.where(mask[None], a, b)


def _k_ec_double(p, n0inv, X, Y, Z):
    """dbl-2009-l (a=0); identity-safe (Z3 = 2YZ = 0)."""
    A = _k_mont_sqr(p, n0inv, X)
    B = _k_mont_sqr(p, n0inv, Y)
    C = _k_mont_sqr(p, n0inv, B)
    t = _k_sub(p, _k_mont_sqr(p, n0inv, _k_add(p, X, B)), _k_add(p, A, C))
    D = _k_double(p, t)
    E = _k_add(p, _k_double(p, A), A)
    X3 = _k_sub(p, _k_mont_sqr(p, n0inv, E), _k_double(p, D))
    C8 = _k_double(p, _k_double(p, _k_double(p, C)))
    Y3 = _k_sub(p, _k_mont_mul(p, n0inv, E, _k_sub(p, D, X3)), C8)
    Z3 = _k_double(p, _k_mont_mul(p, n0inv, Y, Z))
    return X3, Y3, Z3


def _add_core(p, n0inv, P, Q, mixed):
    """Shared add body; Q normalized (Z2 in {0,1}) when mixed."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _k_mont_sqr(p, n0inv, Z1)
    if mixed:
        U1 = X1
        S1 = Y1
        U2 = _k_mont_mul(p, n0inv, X2, Z1Z1)
        S2 = _k_mont_mul(p, n0inv, Y2, _k_mont_mul(p, n0inv, Z1, Z1Z1))
    else:
        Z2Z2 = _k_mont_sqr(p, n0inv, Z2)
        U1 = _k_mont_mul(p, n0inv, X1, Z2Z2)
        U2 = _k_mont_mul(p, n0inv, X2, Z1Z1)
        S1 = _k_mont_mul(p, n0inv, Y1, _k_mont_mul(p, n0inv, Z2, Z2Z2))
        S2 = _k_mont_mul(p, n0inv, Y2, _k_mont_mul(p, n0inv, Z1, Z1Z1))
    H = _k_sub(p, U2, U1)
    if mixed:
        HH = _k_mont_sqr(p, n0inv, H)
        I = _k_double(p, _k_double(p, HH))
    else:
        I = _k_mont_sqr(p, n0inv, _k_double(p, H))
    J = _k_mont_mul(p, n0inv, H, I)
    r = _k_double(p, _k_sub(p, S2, S1))
    V = _k_mont_mul(p, n0inv, U1, I)
    X3 = _k_sub(p, _k_mont_sqr(p, n0inv, r), _k_add(p, J, _k_double(p, V)))
    Y3 = _k_sub(
        p,
        _k_mont_mul(p, n0inv, r, _k_sub(p, V, X3)),
        _k_double(p, _k_mont_mul(p, n0inv, S1, J)),
    )
    if mixed:
        # Z3 = (Z1 + H)^2 - Z1Z1 - HH
        Z3 = _k_sub(
            p,
            _k_sub(p, _k_mont_sqr(p, n0inv, _k_add(p, Z1, H)), Z1Z1),
            HH,
        )
    else:
        zz = _k_sub(
            p,
            _k_mont_sqr(p, n0inv, _k_add(p, Z1, Z2)),
            _k_add(p, Z1Z1, Z2Z2),
        )
        Z3 = _k_mont_mul(p, n0inv, zz, H)

    p_inf = _k_is_zero(Z1)
    q_inf = _k_is_zero(Z2)
    h_zero = _k_is_zero(H)
    r_zero = _k_is_zero(r)
    both = ~p_inf & ~q_inf
    same = both & h_zero & r_zero
    opposite = both & h_zero & ~r_zero

    DX, DY, DZ = _k_ec_double(p, n0inv, X1, Y1, Z1)
    lane1 = jnp.ones_like(X1[0])
    lane0 = jnp.zeros_like(X1[0])
    one = jnp.stack([lane1] + [lane0] * (X1.shape[0] - 1))
    zero = jnp.zeros_like(X1)

    X3 = _k_select(same, DX, X3)
    Y3 = _k_select(same, DY, Y3)
    Z3 = _k_select(same, DZ, Z3)
    # identity in Montgomery limbs: X=Y=R mod p; but any (X, Y) with Z=0 is
    # the identity for these mask-complete formulas, so plain 1 suffices
    X3 = _k_select(opposite, one, X3)
    Y3 = _k_select(opposite, one, Y3)
    Z3 = _k_select(opposite, zero, Z3)
    X3 = _k_select(p_inf, X2, X3)
    Y3 = _k_select(p_inf, Y2, Y3)
    Z3 = _k_select(p_inf, Z2, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)
    return X3, Y3, Z3


def _make_add_kernel(n0inv: int, mixed: bool):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        p = p_ref[...]
        X3, Y3, Z3 = _add_core(
            p,
            n0,
            (x1[...], y1[...], z1[...]),
            (x2[...], y2[...], z2[...]),
            mixed,
        )
        ox[...] = X3
        oy[...] = Y3
        oz[...] = Z3

    return kernel


def _make_dbl_kernel(n0inv: int):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, x1, y1, z1, ox, oy, oz):
        p = p_ref[...]
        X3, Y3, Z3 = _k_ec_double(p, n0, x1[...], y1[...], z1[...])
        ox[...] = X3
        oy[...] = Y3
        oz[...] = Z3

    return kernel


def _tiles(spec: FieldSpec):
    n = spec.n_limbs
    p3 = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(n, 1, 1)
    return n, p3


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _ec_call(spec: FieldSpec, mode: str, interpret: bool, *coords):
    """mode: 'add' | 'madd' | 'dbl'. coords: flat (n, N) arrays, N a
    multiple of _SUBLANES * _LANES."""
    n, p3 = _tiles(spec)
    N = coords[0].shape[-1]
    S = N // _LANES
    g = S // _SUBLANES
    shaped = [c.reshape(n, S, _LANES) for c in coords]

    if mode == "dbl":
        kernel = _make_dbl_kernel(spec.n0inv)
    else:
        kernel = _make_add_kernel(spec.n0inv, mode == "madd")

    blk = pl.BlockSpec(
        (n, _SUBLANES, _LANES),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    small = pl.BlockSpec((n, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n, S, _LANES), jnp.uint32) for _ in range(3)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[small] + [blk] * len(shaped),
        out_specs=[blk] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(p3), *shaped)
    return tuple(o.reshape(n, N) for o in outs)


_TILE = _SUBLANES * _LANES


def ec_op(spec: FieldSpec, mode: str, *coords, interpret: bool = False):
    """Batched EC op on flat (n_limbs, *batch) coordinate arrays.

    Pads the flattened batch to the (sublane x lane) tile, dispatches the
    Pallas kernel, and restores the original batch shape. Padding lanes
    compute garbage on zero limbs (Z=0 -> identity paths), which is
    discarded on slice-back.
    """
    batch = coords[0].shape[1:]
    size = int(np.prod(batch)) if batch else 1
    padded = -(-size // _TILE) * _TILE
    flat = []
    for c in coords:
        f = c.reshape(c.shape[0], size)
        if padded != size:
            f = jnp.concatenate(
                [f, jnp.zeros((c.shape[0], padded - size), jnp.uint32)], axis=1
            )
        flat.append(f)
    outs = _ec_call(spec, mode, interpret, *flat)
    return tuple(o[:, :size].reshape((o.shape[0],) + batch) for o in outs)
