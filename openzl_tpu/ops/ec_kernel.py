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
from ..utils.aot_cache import aot_jit

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


class _OpsF1:
    """In-kernel base-field ops on (n, S, L) limb arrays."""

    def __init__(self, p, n0):
        self.p, self.n0 = p, n0

    def add(self, a, b):
        return _k_add(self.p, a, b)

    def sub(self, a, b):
        return _k_sub(self.p, a, b)

    def double(self, a):
        return _k_double(self.p, a)

    def mul(self, a, b):
        return _k_mont_mul(self.p, self.n0, a, b)

    def sqr(self, a):
        return _k_mont_sqr(self.p, self.n0, a)

    def is_zero(self, a):
        return _k_is_zero(a)

    def select(self, m, a, b):
        return _k_select(m, a, b)

    def one_like(self, a):
        lane1 = jnp.ones_like(a[0])
        lane0 = jnp.zeros_like(a[0])
        return jnp.stack([lane1] + [lane0] * (a.shape[0] - 1))

    def zero_like(self, a):
        return jnp.zeros_like(a)


class _OpsF2:
    """In-kernel Fq2 ops; values are (c0, c1) tuples of (n, S, L) arrays.

    Same Karatsuba / complex-squaring formulas as the jnp path
    (`fields.ext`), parameterized by the tower non-residue u^2 = beta
    (-1 for BN254/BLS12-381, -5 for BLS12-377); since every base op
    returns canonical residues the results are bit-identical.
    """

    def __init__(self, p, n0, beta=-1):
        self.b = _OpsF1(p, n0)
        self.beta = beta

    def _nr(self, x):
        """|beta| * x via a doubling chain (|beta| tiny, trace-time)."""
        k = -self.beta
        bit, acc = x, None
        while k:
            if k & 1:
                acc = bit if acc is None else self.b.add(acc, bit)
            k >>= 1
            if k:
                bit = self.b.add(bit, bit)
        return acc

    def add(self, a, b):
        return (self.b.add(a[0], b[0]), self.b.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.b.sub(a[0], b[0]), self.b.sub(a[1], b[1]))

    def double(self, a):
        return (self.b.double(a[0]), self.b.double(a[1]))

    def mul(self, a, b):
        m0 = self.b.mul(a[0], b[0])
        m1 = self.b.mul(a[1], b[1])
        m2 = self.b.mul(self.b.add(a[0], a[1]), self.b.add(b[0], b[1]))
        return (
            self.b.sub(m0, self._nr(m1)),
            self.b.sub(m2, self.b.add(m0, m1)),
        )

    def sqr(self, a):
        # (a0+a1)(a0 + beta a1) = a0^2 + beta a1^2 + (1+beta) a0 a1
        t = self.b.mul(
            self.b.add(a[0], a[1]), self.b.sub(a[0], self._nr(a[1]))
        )
        m = self.b.mul(a[0], a[1])
        if self.beta == -1:
            c0 = t
        else:
            extra = m
            for _ in range(-self.beta - 2):
                extra = self.b.add(extra, m)
            c0 = self.b.add(t, extra)
        return (c0, self.b.add(m, m))

    def is_zero(self, a):
        return _k_is_zero(a[0]) & _k_is_zero(a[1])

    def select(self, m, a, b):
        return (_k_select(m, a[0], b[0]), _k_select(m, a[1], b[1]))

    def one_like(self, a):
        return (self.b.one_like(a[0]), self.b.zero_like(a[1]))

    def zero_like(self, a):
        return (self.b.zero_like(a[0]), self.b.zero_like(a[1]))


def _k_ec_double(F, X, Y, Z, a=None):
    """dbl-2009-l (a=0) / generic-a Jacobian double (M = 3X^2 + a Z^4);
    identity-safe (Z3 = 2YZ = 0). `a` is the Montgomery-form curve
    coefficient (None for a = 0)."""
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sub(F.sqr(F.add(X, B)), F.add(A, C))
    D = F.double(t)
    E = F.add(F.double(A), A)
    if a is not None:
        E = F.add(E, F.mul(a, F.sqr(F.sqr(Z))))
    X3 = F.sub(F.sqr(E), F.double(D))
    C8 = F.double(F.double(F.double(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    Z3 = F.double(F.mul(Y, Z))
    return X3, Y3, Z3


def _add_core(F, P, Q, mixed, a=None):
    """Shared add body; Q normalized (Z2 in {0,1}) when mixed."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    if mixed:
        U1 = X1
        S1 = Y1
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    else:
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    if mixed:
        HH = F.sqr(H)
        I = F.double(F.double(HH))
    else:
        I = F.sqr(F.double(H))
    J = F.mul(H, I)
    r = F.double(F.sub(S2, S1))
    V = F.mul(U1, I)
    X3 = F.sub(F.sqr(r), F.add(J, F.double(V)))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(S1, J)))
    if mixed:
        # Z3 = (Z1 + H)^2 - Z1Z1 - HH
        Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)
    else:
        zz = F.sub(F.sqr(F.add(Z1, Z2)), F.add(Z1Z1, Z2Z2))
        Z3 = F.mul(zz, H)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(r)
    both = ~p_inf & ~q_inf
    same = both & h_zero & r_zero
    opposite = both & h_zero & ~r_zero

    DX, DY, DZ = _k_ec_double(F, X1, Y1, Z1, a)
    one = F.one_like(X1)
    zero = F.zero_like(X1)

    X3 = F.select(same, DX, X3)
    Y3 = F.select(same, DY, Y3)
    Z3 = F.select(same, DZ, Z3)
    # identity in Montgomery limbs: X=Y=R mod p; but any (X, Y) with Z=0 is
    # the identity for these mask-complete formulas, so plain 1 suffices
    X3 = F.select(opposite, one, X3)
    Y3 = F.select(opposite, one, Y3)
    Z3 = F.select(opposite, zero, Z3)
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, Z2, Z3)
    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    return X3, Y3, Z3


def _split(v, ext):
    """Kernel-side view: (n, S, L) stays; (n, 2, S, L) -> (c0, c1) pair."""
    return v if ext == 1 else (v[:, 0], v[:, 1])


def _join(v, ext):
    return v if ext == 1 else jnp.stack(v, axis=1)


def _ops(ext, p, n0, beta=-1):
    return _OpsF1(p, n0) if ext == 1 else _OpsF2(p, n0, beta)


def _make_add_kernel(
    n0inv: int, mixed: bool, ext: int, beta: int = -1, has_a: bool = False
):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, *refs):
        if has_a:
            a_ref, refs = refs[0], refs[1:]
        x1, y1, z1, x2, y2, z2, ox, oy, oz = refs
        p = p_ref[...].reshape(p_ref.shape[0], 1, 1)
        F = _ops(ext, p, n0, beta)
        a = _split(a_ref[...], ext) if has_a else None
        X3, Y3, Z3 = _add_core(
            F,
            (_split(x1[...], ext), _split(y1[...], ext), _split(z1[...], ext)),
            (_split(x2[...], ext), _split(y2[...], ext), _split(z2[...], ext)),
            mixed,
            a,
        )
        ox[...] = _join(X3, ext)
        oy[...] = _join(Y3, ext)
        oz[...] = _join(Z3, ext)

    return kernel


def _make_dbl_kernel(n0inv: int, ext: int, beta: int = -1, has_a: bool = False):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, *refs):
        if has_a:
            a_ref, refs = refs[0], refs[1:]
        x1, y1, z1, ox, oy, oz = refs
        p = p_ref[...].reshape(p_ref.shape[0], 1, 1)
        F = _ops(ext, p, n0, beta)
        a = _split(a_ref[...], ext) if has_a else None
        X3, Y3, Z3 = _k_ec_double(
            F,
            _split(x1[...], ext), _split(y1[...], ext), _split(z1[...], ext),
            a,
        )
        ox[...] = _join(X3, ext)
        oy[...] = _join(Y3, ext)
        oz[...] = _join(Z3, ext)

    return kernel


def _a_mont_limbs(spec: FieldSpec, ext: int, a) -> np.ndarray:
    """Montgomery limb array for the curve coefficient a: (n, 1, 1) for
    Fq, (n, 2, 1, 1) for Fq2 (a given as an int or (c0, c1) pair)."""
    from ..fields.spec import int_to_limbs

    n = spec.n_limbs
    if ext == 1:
        assert not isinstance(a, tuple)
        return int_to_limbs(spec.to_mont(a % spec.modulus), n).reshape(n, 1, 1)
    pair = a if isinstance(a, tuple) else (a, 0)
    cols = [
        int_to_limbs(spec.to_mont(c % spec.modulus), n) for c in pair
    ]
    return np.stack(cols, axis=1).reshape(n, 2, 1, 1)


@functools.partial(aot_jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _ec_call(
    spec: FieldSpec, mode: str, ext: int, beta: int, a, interpret: bool,
    *coords,
):
    """mode: 'add' | 'madd' | 'dbl'. coords: flat (n, N) (ext=1) or
    (n, 2, N) (ext=2) arrays, N a multiple of the batch tile. `a` is the
    static curve coefficient (0 keeps the cheaper a=0 double)."""
    n = spec.n_limbs
    p3 = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(
        (n,) + (1,) * (ext + 1)
    )
    N = coords[0].shape[-1]
    S = N // _LANES
    sub = _SUBLANES if ext == 1 else _SUBLANES // 2
    g = S // sub
    has_a = a != 0 and not (isinstance(a, tuple) and a == (0, 0))

    if mode == "dbl":
        kernel = _make_dbl_kernel(spec.n0inv, ext, beta, has_a)
    else:
        kernel = _make_add_kernel(spec.n0inv, mode == "madd", ext, beta, has_a)

    if ext == 1:
        shaped = [c.reshape(n, S, _LANES) for c in coords]
        blk = pl.BlockSpec(
            (n, sub, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        small = pl.BlockSpec(
            (n, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = [
            jax.ShapeDtypeStruct((n, S, _LANES), jnp.uint32) for _ in range(3)
        ]
    else:
        shaped = [c.reshape(n, 2, S, _LANES) for c in coords]
        blk = pl.BlockSpec(
            (n, 2, sub, _LANES),
            lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        small = pl.BlockSpec(
            (n, 1, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = [
            jax.ShapeDtypeStruct((n, 2, S, _LANES), jnp.uint32)
            for _ in range(3)
        ]
    operands = [jnp.asarray(p3)]
    in_specs = [small]
    if has_a:
        a3 = _a_mont_limbs(spec, ext, a)
        a_spec = pl.BlockSpec(
            a3.shape, lambda i: (0,) * a3.ndim, memory_space=pltpu.VMEM
        )
        operands.append(jnp.asarray(a3))
        in_specs.append(a_spec)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs + [blk] * len(shaped),
        out_specs=[blk] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands, *shaped)
    if ext == 1:
        return tuple(o.reshape(n, N) for o in outs)
    return tuple(o.reshape(n, 2, N) for o in outs)


_TILE = _SUBLANES * _LANES


# ---------------------------------------------------------------------------
# fused gather-fold kernel (MSM bucket pipeline)
# ---------------------------------------------------------------------------


def _make_fold_kernel(
    n0inv: int, ext: int, beta: int, skip_z: bool, r: int, has_a: bool = False
):
    """Kernel folding r sorted columns with the mixed add, writing every
    column's running prefix plus the chunk totals — the serial madd fold of
    `ops.msm._bucket_totals_fast` in ONE launch instead of r Pallas calls
    plus r dynamic-update-slice passes (the fold was 41 ms/window at 2^20,
    ~3x its own compute+bandwidth floor; experiments/msm_gatherfold_probe).

    Ref shapes (per grid block): coords (n[, 2], *mid, r, lb), starts
    (*smid, r, lb) u32; outputs buf x/y/z like coords and totals
    (n[, 2], *mid, lb). The fold runs under ONE in-kernel fori_loop with
    dynamic column slicing, so the traced graph holds a single madd.
    """
    n0 = np.uint32(n0inv)

    def kernel(p_ref, *all_refs):
        if has_a:
            a_ref, all_refs = all_refs[0], all_refs[1:]
        st_ref, refs = all_refs[0], all_refs[1:]
        if skip_z:
            px_ref, py_ref = refs[0], refs[1]
            pz_ref = None
            bx, by, bz, tx, ty, tz = refs[2:]
        else:
            px_ref, py_ref, pz_ref = refs[0], refs[1], refs[2]
            bx, by, bz, tx, ty, tz = refs[3:]
        nd = px_ref.ndim
        p = p_ref[...].reshape(p_ref.shape[0], *(1,) * (nd - 2))
        F = _ops(ext, p, n0, beta)
        if has_a:
            av = a_ref[...]  # (n[, 2], 1, 1)
            shape_tail = (1,) * (nd - 2 - (ext == 2))
            if ext == 2:
                a_val = (
                    av[:, 0].reshape(av.shape[0], *shape_tail),
                    av[:, 1].reshape(av.shape[0], *shape_tail),
                )
            else:
                a_val = av.reshape(av.shape[0], *shape_tail)
        else:
            a_val = None

        def col(ref, j):
            v = ref[(Ellipsis, pl.ds(j, 1), slice(None))]
            return jax.lax.squeeze(v, (v.ndim - 2,))

        x0 = col(px_ref, 0)
        idx = F.one_like(_split(x0, ext))
        idz = F.zero_like(_split(x0, ext))

        def write(ref, j, v):
            ref[(Ellipsis, pl.ds(j, 1), slice(None))] = jnp.expand_dims(
                _join(v, ext), -2
            )

        def body(j, acc):
            qx = _split(col(px_ref, j), ext)
            qy = _split(col(py_ref, j), ext)
            if pz_ref is None:
                qz = F.one_like(qx)
            else:
                qz = _split(col(pz_ref, j), ext)
            ax, ay, az = _add_core(F, acc, (qx, qy, qz), mixed=True, a=a_val)
            s = col(st_ref, j) != 0  # (smid..., lb) -> broadcasts over limbs
            ax = F.select(s, qx, ax)
            ay = F.select(s, qy, ay)
            az = F.select(s, qz, az)
            write(bx, j, ax)
            write(by, j, ay)
            write(bz, j, az)
            return (ax, ay, az)

        accx, accy, accz = jax.lax.fori_loop(0, r, body, (idx, idx, idz))
        tx[...] = _join(accx, ext)
        ty[...] = _join(accy, ext)
        tz[...] = _join(accz, ext)

    return kernel


#: VMEM budget for the fold kernel's live blocks (bytes) — coords in (2-3)
#: + prefix buffers out (3), double-buffered by the Pallas pipeline (hence
#: the budget is ~half the 16 MB VMEM, minus temporaries).
_FOLD_VMEM_BUDGET = 6 << 20


def fold_block_lanes(n_limbs: int, ext: int, mid: int, r: int, skip_z: bool) -> int:
    """Largest power-of-two lane-block fitting the VMEM budget; 0 if even
    128 lanes do not fit (caller falls back to the jnp fold)."""
    coords_in = 2 if skip_z else 3
    per_lane = n_limbs * ext * mid * r * 4 * (coords_in + 3)
    for lb in (512, 256, 128):
        if per_lane * lb <= _FOLD_VMEM_BUDGET:
            return lb
    return 0


@functools.partial(aot_jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fold_call(
    spec: FieldSpec, ext: int, beta: int, skip_z: bool, a, interpret: bool,
    starts, *coords
):
    """coords: (n[, 2], *mid, r, l) sorted column-major points (2 coords
    when skip_z else 3); starts: (*smid, r, l) u32 segment-start mask.
    Returns (bufx, bufy, bufz, totx, toty, totz)."""
    n = spec.n_limbs
    cshape = coords[0].shape
    r, l = cshape[-2], cshape[-1]
    mid = cshape[1 + (ext == 2):-2]
    midp = 1
    for d in mid:
        midp *= d
    lb = fold_block_lanes(n, ext, midp, r, skip_z)
    assert lb and l % lb == 0, (cshape, lb)
    g = l // lb

    p3 = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(
        (n,) + (1,) * (len(cshape) - 1)
    )
    smid = starts.shape[:-2]

    def blk(shape_head):
        nd = len(shape_head)
        return pl.BlockSpec(
            shape_head + (r, lb),
            lambda i, nd=nd: (0,) * nd + (0, i),
            memory_space=pltpu.VMEM,
        )

    def blk_tot(shape_head):
        nd = len(shape_head)
        return pl.BlockSpec(
            shape_head + (lb,),
            lambda i, nd=nd: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    chead = cshape[:-2]
    small = pl.BlockSpec(
        (n,) + (1,) * (len(cshape) - 1),
        lambda i: (0,) * len(cshape),
        memory_space=pltpu.VMEM,
    )
    has_a = a != 0 and not (isinstance(a, tuple) and a == (0, 0))
    kernel = _make_fold_kernel(spec.n0inv, ext, beta, skip_z, r, has_a)
    out_shape = [jax.ShapeDtypeStruct(chead + (r, l), jnp.uint32)] * 3 + [
        jax.ShapeDtypeStruct(chead + (l,), jnp.uint32)
    ] * 3
    operands = [jnp.asarray(p3)]
    in_specs = [small]
    if has_a:
        a3 = _a_mont_limbs(spec, ext, a)
        operands.append(jnp.asarray(a3))
        in_specs.append(
            pl.BlockSpec(
                a3.shape, lambda i: (0,) * a3.ndim, memory_space=pltpu.VMEM
            )
        )
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs + [blk(smid), *([blk(chead)] * len(coords))],
        out_specs=[blk(chead)] * 3 + [blk_tot(chead)] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands, starts, *coords)
    return outs


def fold_madd(
    spec: FieldSpec,
    starts,
    coords,
    ext: int = 1,
    beta: int = -1,
    a=0,
    skip_z: bool = False,
    interpret: bool = False,
):
    """Fused sorted-column madd fold (see `_make_fold_kernel`).

    starts: (*smid, r, l) bool; coords: 2 (skip_z) or 3 arrays
    (n[, 2], *mid, r, l). Returns ((bufx, bufy, bufz), (totx, toty, totz)).
    """
    outs = _fold_call(
        spec, ext, beta, skip_z, a, interpret,
        starts.astype(jnp.uint32), *coords,
    )
    return outs[:3], outs[3:]


def ec_op(
    spec: FieldSpec,
    mode: str,
    *coords,
    ext: int = 1,
    beta: int = -1,
    a=0,
    interpret: bool = False,
):
    """Batched EC op on flat (n_limbs[, 2], *batch) coordinate arrays.

    Pads the flattened batch to the (sublane x lane) tile, dispatches the
    Pallas kernel, and restores the original batch shape. Padding lanes
    compute garbage on zero limbs (Z=0 -> identity paths), which is
    discarded on slice-back. ext=2 selects the Fq2 (G2) group law; the
    tile is halved to keep the doubled per-op VMEM footprint in budget.
    """
    lead = 1 + (ext == 2)
    batch = coords[0].shape[lead:]
    size = int(np.prod(batch)) if batch else 1
    tile = _TILE if ext == 1 else _TILE // 2
    padded = -(-size // tile) * tile
    head = coords[0].shape[:lead]
    flat = []
    for c in coords:
        f = c.reshape(head + (size,))
        if padded != size:
            f = jnp.concatenate(
                [f, jnp.zeros(head + (padded - size,), jnp.uint32)],
                axis=-1,
            )
        flat.append(f)
    outs = _ec_call(spec, mode, ext, beta, a, interpret, *flat)
    return tuple(o[..., :size].reshape(head + batch) for o in outs)
