"""Pallas TPU kernel for the batched Poseidon permutation.

Why a kernel: the jnp path materializes every limb op through HBM (63 rounds
x ~18 field muls each), leaving throughput ~2 orders below the VPU's
speed-of-light. Here one grid step loads a batch tile of states into VMEM
once, runs ALL rounds in-core, and writes back once — the only HBM traffic
is one read + one write of the state.

Measured on TPU v5e (batch 2^16, BN254 Fr): ~5.0 M perms/s vs 0.13 M/s for
the fused-XLA jnp path. Two design points matter:
  * state lanes are SEPARATE kernel operands carried as a tuple through the
    round loops — an earlier stacked-(width, n, S, L) variant re-stacked the
    state every round, costing ~40x
  * batch tile (S, L) = (32, 128): montmul microbench peaks at 1.85 G
    montmuls/s there (8x128 is latency-bound, 32x512 spills)

Field arithmetic is the same 16-bit-limb Montgomery scheme as
:mod:`openzl_tpu.fields.limb` (see its overflow analysis), expressed with
Python-list column "registers" (Mosaic has no scatter) and with the modulus
passed as a VMEM operand (Pallas forbids captured array constants; 1-D to
3-D reshapes are unsupported shape casts, so all broadcast dims are added
host-side).

Round keys live in VMEM, dynamically indexed per round inside `fori_loop`s
(dynamic indexing is supported on a ref's leading dim, not on loaded
values), so the trace stays small.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.poseidon.permutation import Poseidon
from ..fields.spec import LIMB_BITS, LIMB_MASK

_LANES = 128
_MASK = np.uint32(LIMB_MASK)
_ONE = np.uint32(1)
_CARRY = np.uint32(1 << LIMB_BITS)


# ---------------------------------------------------------------------------
# kernel-local limb arithmetic (mirrors fields/limb.py; p passed as array)
# ---------------------------------------------------------------------------


def _sub_raw(a, b):
    outs = []
    borrow = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        t = a[i] + _CARRY - b[i] - borrow
        outs.append(t & _MASK)
        borrow = _ONE - (t >> LIMB_BITS)
    return jnp.stack(outs), borrow


def _cond_sub_p(p, x):
    d, borrow = _sub_raw(x, jnp.broadcast_to(p, x.shape))
    return jnp.where(borrow.astype(bool)[None], x, d)


def _k_add(p, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        c = a[i] + b[i] + carry
        outs.append(c & _MASK)
        carry = c >> LIMB_BITS
    return _cond_sub_p(p, jnp.stack(outs))


def _k_mont_mul(p, n0inv, a, b):
    """Interleaved Montgomery product, lazy u32 columns (limb.py:mont_mul).

    Columns live in a Python list (vector "registers") — Mosaic has no
    scatter, and fully unrolled adds map straight onto the VPU anyway.
    """
    n = a.shape[0]
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    zero = jnp.zeros(batch, dtype=jnp.uint32)
    cols = [zero] * (2 * n + 1)
    for i in range(n):
        prod = a[i] * b  # (n, *batch)
        for j in range(n):
            cols[i + j] = cols[i + j] + (prod[j] & _MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod[j] >> LIMB_BITS)
    return _mont_reduce(p, n0inv, cols, zero)


def _mont_reduce(p, n0inv, cols, zero):
    """Shared Montgomery reduction over lazy u32 columns (phase 2 of
    _k_mont_mul), cols list of length 2n+1."""
    n = p.shape[0]
    carry = zero
    for i in range(n):
        ci = cols[i] + carry
        m = (ci * n0inv) & _MASK
        mp = m[None] * p  # (n, *batch)
        carry = (ci + (mp[0] & _MASK)) >> LIMB_BITS
        for j in range(1, n):
            cols[i + j] = cols[i + j] + (mp[j] & _MASK) + (mp[j - 1] >> LIMB_BITS)
        cols[i + n] = cols[i + n] + (mp[n - 1] >> LIMB_BITS)
    cols[n] = cols[n] + carry
    outs = []
    c = zero
    for i in range(n):
        v = cols[n + i] + c
        outs.append(v & _MASK)
        c = v >> LIMB_BITS
    return _cond_sub_p(p, jnp.stack(outs))


def _k_mont_sqr(p, n0inv, a):
    """Montgomery square: off-diagonal limb products are computed once and
    the accumulated columns doubled, ~n^2/2 muls vs n^2 for _k_mont_mul.

    Overflow: off-diagonal column accumulates <= n/2 split halves (< 2^16
    each) so doubling stays far below 2^32."""
    n = a.shape[0]
    batch = a.shape[1:]
    zero = jnp.zeros(batch, dtype=jnp.uint32)
    off = [zero] * (2 * n + 1)  # strictly i<j products, to be doubled
    for i in range(n - 1):
        prod = a[i] * a[i + 1 :]  # (n-i-1, *batch), pairs (i, j>i)
        for k in range(prod.shape[0]):
            j = i + 1 + k
            off[i + j] = off[i + j] + (prod[k] & _MASK)
            off[i + j + 1] = off[i + j + 1] + (prod[k] >> LIMB_BITS)
    cols = [c + c for c in off]
    for i in range(n):  # diagonal a_i^2
        sq = a[i] * a[i]
        cols[2 * i] = cols[2 * i] + (sq & _MASK)
        cols[2 * i + 1] = cols[2 * i + 1] + (sq >> LIMB_BITS)
    return _mont_reduce(p, n0inv, cols, zero)


def _k_pow5(p, n0inv, a):
    a2 = _k_mont_sqr(p, n0inv, a)
    a4 = _k_mont_sqr(p, n0inv, a2)
    return _k_mont_mul(p, n0inv, a4, a)


# ---------------------------------------------------------------------------
# the permutation kernel (state lanes as separate operands)
# ---------------------------------------------------------------------------


def _kernel(perm: Poseidon, *refs):
    width = perm.width
    p_ref, keys_ref, mds_ref = refs[0], refs[1], refs[2]
    in_refs = refs[3 : 3 + width]
    out_refs = refs[3 + width :]

    p = p_ref[:]  # (n, 1, 1)
    mds = mds_ref[:]  # (w, w, n, 1, 1)
    n0inv = np.uint32(perm.spec.n0inv)
    half = perm.full_rounds // 2
    mid = half + perm.partial_rounds

    def mds_mul(xs):
        out = []
        for i in range(width):
            acc = _k_mont_mul(p, n0inv, xs[0], mds[i, 0])
            for j in range(1, width):
                acc = _k_add(p, acc, _k_mont_mul(p, n0inv, xs[j], mds[i, j]))
            out.append(acc)
        return out

    def full_round(r, st):
        kr = keys_ref[r]  # (w, n, 1, 1)
        xs = [_k_pow5(p, n0inv, _k_add(p, st[w], kr[w])) for w in range(width)]
        return tuple(mds_mul(xs))

    def partial_round(r, st):
        kr = keys_ref[r]
        xs = [_k_add(p, st[w], kr[w]) for w in range(width)]
        xs[0] = _k_pow5(p, n0inv, xs[0])
        return tuple(mds_mul(xs))

    st = tuple(ref[0] for ref in in_refs)  # each (n, S, L)
    st = lax.fori_loop(0, half, full_round, st)
    st = lax.fori_loop(half, mid, partial_round, st)
    st = lax.fori_loop(mid, perm.rounds, full_round, st)
    for w in range(width):
        out_refs[w][0] = st[w]


def _kernel_opt(perm: Poseidon, *refs):
    """Optimized Poseidon rounds (sparse partial layers, post-sbox keys).

    Bit-identical to `_kernel`; partial rounds cost 2w-1 montmuls instead of
    w^2 (+ w sbox muls). Parameter derivation: crypto/poseidon/{mds.py,
    preprocessing.py} (reference openzl-crypto/src/poseidon/mds.rs,
    preprocessing.rs)."""
    width = perm.width
    (p_ref, mds_ref, pre_ref, init_ref, fkeys_ref, pkeys_ref, what_ref,
     vrest_ref) = refs[:8]
    in_refs = refs[8 : 8 + width]
    out_refs = refs[8 + width :]

    p = p_ref[:]  # (n, 1, 1)
    mds = mds_ref[:]  # (w, w, n, 1, 1)
    pre = pre_ref[:]
    n0inv = np.uint32(perm.spec.n0inv)
    half = perm.full_rounds // 2

    def mat_left(mat, xs):
        # out_j = sum_i xs[i] * mat[i, j] (row-vector-at-left convention of
        # the optimized derivation; the dense MDS is symmetric)
        out = []
        for j in range(width):
            acc = _k_mont_mul(p, n0inv, xs[0], mat[0, j])
            for i in range(1, width):
                acc = _k_add(p, acc, _k_mont_mul(p, n0inv, xs[i], mat[i, j]))
            out.append(acc)
        return out

    def full_round(r, st):
        kr = fkeys_ref[r]  # (w, n, 1, 1)
        xs = [_k_add(p, _k_pow5(p, n0inv, st[w]), kr[w]) for w in range(width)]
        return tuple(mat_left(mds, xs))

    def partial_round(r, st):
        x0 = _k_add(p, _k_pow5(p, n0inv, st[0]), pkeys_ref[r])
        wh = what_ref[r]  # (w, n, 1, 1)
        vr = vrest_ref[r]  # (w-1, n, 1, 1)
        out0 = _k_mont_mul(p, n0inv, x0, wh[0])
        for i in range(1, width):
            out0 = _k_add(p, out0, _k_mont_mul(p, n0inv, st[i], wh[i]))
        rest = [
            _k_add(p, st[j], _k_mont_mul(p, n0inv, x0, vr[j - 1]))
            for j in range(1, width)
        ]
        return (out0, *rest)

    st = tuple(ref[0] for ref in in_refs)  # each (n, S, L)
    init = init_ref[:]
    st = tuple(_k_add(p, st[w], init[w]) for w in range(width))
    st = lax.fori_loop(0, half - 1, full_round, st)
    # boundary full round: post-add keys then the pre-sparse matrix
    kr = fkeys_ref[half - 1]
    st = tuple(
        _k_add(p, _k_pow5(p, n0inv, st[w]), kr[w]) for w in range(width)
    )
    st = tuple(mat_left(pre, st))
    st = lax.fori_loop(0, perm.partial_rounds, partial_round, st)
    st = lax.fori_loop(half, perm.full_rounds - 1, full_round, st)
    # final full round: no constants
    st = tuple(mat_left(mds, [_k_pow5(p, n0inv, x) for x in st]))
    for w in range(width):
        out_refs[w][0] = st[w]


def to_lanes(state: jnp.ndarray, block_sublanes: int = 32):
    """(n_limbs, width, B) -> width-list of (n_blocks, n_limbs, S, L).

    The kernel's native layout. Pipelines that hash repeatedly (Merkle
    levels, chained benches) should stay in lane layout — the conversion
    costs ~6 HBM passes, comparable to a whole permutation."""
    n, width, B = state.shape
    tile = block_sublanes * _LANES
    n_blocks = B // tile
    return [
        state[:, w]
        .reshape(n, n_blocks, block_sublanes, _LANES)
        .swapaxes(0, 1)
        for w in range(width)
    ]


def from_lanes(lanes):
    """Inverse of :func:`to_lanes` -> (n_limbs, width, B)."""
    n_blocks, n, S, L = lanes[0].shape
    outs = [o.swapaxes(0, 1).reshape(n, n_blocks * S * L) for o in lanes]
    return jnp.stack(outs, axis=1)


def permute_lanes(perm: Poseidon, lanes, interpret: bool = False):
    """Permutation in kernel layout: width-tuple of (n_blocks, n, S, L).

    Accepts any sequence; always passes/returns a TUPLE so chained calls hit
    one jit trace (a list input and tuple output would retrace every call).
    """
    return _permute_lanes_jit(perm, tuple(lanes), interpret=interpret)


@functools.partial(jax.jit, static_argnums=0, static_argnames=("interpret",))
def _permute_lanes_jit(perm: Poseidon, lanes, interpret: bool = False):
    n_blocks, n, S, L = lanes[0].shape
    width = perm.width
    p_arr = jnp.asarray(perm.spec.p_limbs)[:, None, None]
    keys = jnp.swapaxes(jnp.asarray(perm.round_keys), 1, 2)[..., None, None]
    mds = jnp.moveaxis(jnp.asarray(perm.mds), 0, 2)[..., None, None]
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec(
        (1, n, S, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, perm),
        out_shape=[jax.ShapeDtypeStruct((n_blocks, n, S, L), jnp.uint32)]
        * width,
        grid=(n_blocks,),
        in_specs=[small] * 3 + [lane_spec] * width,
        out_specs=[lane_spec] * width,
        interpret=interpret,
    )(p_arr, keys, mds, *lanes)
    return tuple(out)


def permute_lanes_opt(perm: Poseidon, lanes, interpret: bool = False):
    """Optimized-rounds permutation in kernel layout (see permute_lanes)."""
    return _permute_lanes_opt_jit(perm, tuple(lanes), interpret=interpret)


@functools.partial(jax.jit, static_argnums=0, static_argnames=("interpret",))
def _permute_lanes_opt_jit(perm: Poseidon, lanes, interpret: bool = False):
    n_blocks, n, S, L = lanes[0].shape
    width = perm.width
    bc = lambda a, k: jnp.asarray(a).reshape(a.shape + (1,) * k)  # noqa: E731
    p_arr = bc(perm.spec.p_limbs, 2)
    # (w, w, n, 1, 1): mat[i][j] indexed [i, j]
    mds = bc(np.moveaxis(perm.mds, 0, 2), 2)
    pre = bc(np.moveaxis(perm.opt_pre_sparse, 0, 2), 2)
    init = bc(np.moveaxis(perm.opt_initial, 0, 1), 2)  # (w, n, 1, 1)
    fkeys = bc(np.swapaxes(perm.opt_full_keys, 1, 2), 2)  # (R_F-1, w, n,1,1)
    pkeys = bc(perm.opt_partial_keys, 2)  # (R_P, n, 1, 1)
    what = bc(np.swapaxes(perm.opt_w_hat, 1, 2), 2)  # (R_P, w, n, 1, 1)
    vrest = bc(np.swapaxes(perm.opt_v_rest, 1, 2), 2)  # (R_P, w-1, n, 1, 1)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec(
        (1, n, S, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel_opt, perm),
        out_shape=[jax.ShapeDtypeStruct((n_blocks, n, S, L), jnp.uint32)]
        * width,
        grid=(n_blocks,),
        in_specs=[small] * 8 + [lane_spec] * width,
        out_specs=[lane_spec] * width,
        interpret=interpret,
    )(p_arr, mds, pre, init, fkeys, pkeys, what, vrest, *lanes)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 2), static_argnames=("interpret",))
def permute(
    perm: Poseidon,
    state: jnp.ndarray,
    block_sublanes: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched permutation on TPU: state (n_limbs, width, B) -> same.

    B must be a multiple of block_sublanes * 128 (pad externally).
    """
    n, width, B = state.shape
    tile = block_sublanes * _LANES
    assert B % tile == 0, f"batch {B} not a multiple of {tile}"
    lanes = to_lanes(state, block_sublanes)
    out = permute_lanes(perm, lanes, interpret=interpret)
    return from_lanes(out)


def hash_batch(
    perm: Poseidon, inputs: jnp.ndarray, block_sublanes: int = 32
) -> jnp.ndarray:
    """inputs (n_limbs, arity, B) Montgomery -> digests (n_limbs, B)."""
    spec = perm.spec
    B = inputs.shape[2]
    tag = jnp.broadcast_to(
        jnp.asarray(perm.domain_tag_mont()).reshape(spec.n_limbs, 1, 1),
        (spec.n_limbs, 1, B),
    )
    state = jnp.concatenate([tag, inputs], axis=1)
    return permute(perm, state, block_sublanes)[:, 0]
