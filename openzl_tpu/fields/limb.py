"""Vectorized big-field arithmetic over 16-bit limbs in ``uint32`` lanes.

This is the TPU-native replacement for the reference's L0 math engine
(ark-ff Montgomery bigints; SURVEY.md section 2.8). Elements are little-endian
16-bit limb vectors with the **limb axis first**: shape ``(n_limbs, *batch)``.
Keeping the batch on trailing axes means every limb operation is a full-width
VPU vector op over the batch (the TPU lane dimension), and limb-index loops
are unrolled at trace time with static slices.

All functions are pure jnp (jit/vmap/shard-friendly) and run on both the TPU
and CPU backends. Hot-path fusion into Pallas kernels lives in
``openzl_tpu.ops``; this module is the portable reference implementation and
the building block for everything else (Poseidon, NTT, MSM, pairings).

Montgomery arithmetic: elements in "mont form" represent ``x * R mod p`` with
``R = 2^(16 n)``. ``mont_mul(a, b) = a b R^{-1} mod p`` via interleaved
operand scanning with lazy (deferred-carry) 32-bit column accumulators:
partial products are exact in uint32 (16x16 bits) and each column accumulates
at most ``4 n < 2^7`` terms of ``< 2^16``, so columns stay below ``2^23`` —
no 64-bit arithmetic needed anywhere.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

def _jit_spec(fun=None, *, static=(0,)):
    """jit with the FieldSpec (and other static args) hashed statically."""
    def wrap(f):
        return functools.wraps(f)(jax.jit(f, static_argnums=static))
    return wrap(fun) if fun is not None else wrap

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs, limbs_to_int

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_ONE = np.uint32(1)
_CARRY = np.uint32(1 << LIMB_BITS)


def _const(spec_limbs: np.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a (n,) limb-constant so it broadcasts over `ndim-1` batch axes."""
    return jnp.asarray(spec_limbs.reshape(spec_limbs.shape + (1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def pack(spec: FieldSpec, values) -> np.ndarray:
    """Python ints (nested lists / arrays of objects) -> (n_limbs, *batch) uint32.

    Routes through the native C++ converter when built (witness vectors at
    2^17+ make the per-element Python loop a prove-path bottleneck)."""
    arr = np.asarray(values, dtype=object)
    if arr.size >= 256:
        try:
            from .. import native

            # native packer assumes canonical residues; reduce on the host
            reduced = np.empty(arr.shape, dtype=object)
            for idx in np.ndindex(arr.shape):
                reduced[idx] = int(arr[idx]) % spec.modulus
            out = native.pack_limbs(spec, reduced)
            if out is not None:
                return out
        except Exception:
            pass
    out = np.zeros((spec.n_limbs,) + arr.shape, dtype=np.uint32)
    for idx in np.ndindex(arr.shape):
        out[(slice(None),) + idx] = int_to_limbs(int(arr[idx]) % spec.modulus, spec.n_limbs)
    return out


def unpack(spec: FieldSpec, limbs) -> np.ndarray:
    """(n_limbs, *batch) uint32 -> object array of Python ints."""
    limbs = np.asarray(limbs)
    batch_shape = limbs.shape[1:]
    if int(np.prod(batch_shape)) >= 256:
        try:
            from .. import native

            out = native.unpack_limbs(spec, limbs)
            if out is not None:
                return out
        except Exception:
            pass
    out = np.empty(batch_shape, dtype=object)
    if batch_shape == ():
        return np.array(limbs_to_int(limbs), dtype=object)
    for idx in np.ndindex(batch_shape):
        out[idx] = limbs_to_int(limbs[(slice(None),) + idx])
    return out


def zeros(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((spec.n_limbs,) + tuple(batch_shape), dtype=_U32)


# ---------------------------------------------------------------------------
# carry machinery
# ---------------------------------------------------------------------------


def _propagate(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Carry-propagate lazy u32 columns into `n_out` normalized 16-bit limbs.

    Any carry beyond limb `n_out - 1` is dropped (callers guarantee it is zero
    or reduce modulo 2^(16 n) on purpose).
    """
    outs = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n_out):
        c = cols[i] + carry
        outs.append(c & _MASK)
        carry = c >> LIMB_BITS
    return jnp.stack(outs)


def _add_raw(a: jnp.ndarray, b: jnp.ndarray):
    """Normalized limb add; returns (sum limbs, carry_out in {0,1})."""
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        c = a[i] + b[i] + carry
        outs.append(c & _MASK)
        carry = c >> LIMB_BITS
    return jnp.stack(outs), carry


def _sub_raw(a: jnp.ndarray, b: jnp.ndarray):
    """Normalized limb subtract; returns (diff mod 2^(16n), borrow in {0,1})."""
    outs = []
    borrow = jnp.zeros_like(a[0])
    for i in range(a.shape[0]):
        t = a[i] + _CARRY - b[i] - borrow
        outs.append(t & _MASK)
        borrow = _ONE - (t >> LIMB_BITS)
    return jnp.stack(outs), borrow


def _cond_sub_p(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Reduce x in [0, 2p) to [0, p) by one conditional subtraction."""
    p = _const(spec.p_limbs, x.ndim)
    d, borrow = _sub_raw(x, p)
    return jnp.where(borrow.astype(bool), x, d)


# ---------------------------------------------------------------------------
# modular ring ops (operands canonical, limb-normalized, in [0, p))
# ---------------------------------------------------------------------------


@_jit_spec
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _add_raw(a, b)  # carry_out is 0: 2p < 2^(16n)
    return _cond_sub_p(spec, s)


@_jit_spec
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_raw(a, b)
    p = _const(spec.p_limbs, a.ndim)
    wrapped, _ = _add_raw(d, p)
    return jnp.where(borrow.astype(bool), wrapped, d)


@_jit_spec
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    p = _const(spec.p_limbs, a.ndim)
    d, _ = _sub_raw(p, a)
    return jnp.where(is_zero(a), a, d)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over the batch (shape a.shape[1:])."""
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise `mask ? a : b`; mask has the batch shape (no limb axis)."""
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------


@_jit_spec
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * b * R^{-1} mod p for canonical limb vectors (broadcasting batch).

    Interleaved product accumulation and Montgomery reduction over lazy u32
    columns; see module docstring for the overflow analysis.
    """
    n = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    n0inv = np.uint32(spec.n0inv)
    p = _const(spec.p_limbs, a.ndim)

    cols = jnp.zeros((2 * n + 1,) + batch, dtype=_U32)

    # product phase: cols <- sum_i a_i * b * 2^(16 i), carries deferred
    for i in range(n):
        prod = a[i] * b  # (n, *batch), exact in u32
        cols = cols.at[i : i + n].add(prod & _MASK)
        cols = cols.at[i + 1 : i + n + 1].add(prod >> LIMB_BITS)

    # reduction phase: make cols[0..n) divisible by 2^16 limb by limb
    carry = jnp.zeros(batch, dtype=_U32)
    for i in range(n):
        ci = cols[i] + carry
        m = (ci * n0inv) & _MASK
        mp = m[None] * p  # (n, *batch), exact in u32
        lo = mp & _MASK
        hi = mp >> LIMB_BITS
        carry = (ci + lo[0]) >> LIMB_BITS
        cols = cols.at[i + 1 : i + n].add(lo[1:] + hi[:-1])
        cols = cols.at[i + n].add(hi[-1])

    cols = cols.at[n].add(carry)
    out = _propagate(cols[n : 2 * n + 1], n)
    return _cond_sub_p(spec, out)


@_jit_spec
def mont_mul_compact(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mont_mul with a scan-compressed trace (~40 HLO ops vs ~300 unrolled).

    Same math as :func:`mont_mul`; the limb loops run under `lax.scan` so
    deep compositions (EC adds inside MSM scans) keep compile time bounded.
    The unrolled variant stays the default for shallow hot loops (Poseidon,
    NTT) where full unrolling fuses best.
    """
    n = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    n0inv = np.uint32(spec.n0inv)
    p = _const(spec.p_limbs, a.ndim)

    cols = jnp.zeros((2 * n + 1,) + batch, dtype=_U32)

    # product phase: dynamic-slice accumulation at offset i
    def prod_body(cols, xi):
        ai, i = xi
        prod = ai[None] * b  # (n, *batch)
        lo = prod & _MASK
        hi = prod >> LIMB_BITS
        seg = lax.dynamic_slice_in_dim(cols, i, n + 1, 0)
        seg = seg.at[:n].add(lo).at[1:].add(hi)
        return lax.dynamic_update_slice_in_dim(cols, seg, i, 0), None

    cols, _ = lax.scan(prod_body, cols, (a, jnp.arange(n)))

    # reduction phase: shifting register, current column always at index 0
    def red_body(carry, _):
        cols, carry_v = carry
        ci = cols[0] + carry_v
        m = (ci * n0inv) & _MASK
        mp = m[None] * p
        lo = mp & _MASK
        hi = mp >> LIMB_BITS
        carry_next = (ci + lo[0]) >> LIMB_BITS
        cols = cols.at[1:n].add(lo[1:] + hi[:-1])
        cols = cols.at[n].add(hi[-1])
        cols = jnp.concatenate([cols[1:], jnp.zeros((1,) + batch, _U32)])
        return (cols, carry_next), None

    (cols, carry), _ = lax.scan(
        red_body, (cols, jnp.zeros(batch, _U32)), None, length=n
    )
    cols = cols.at[0].add(carry)
    out = _propagate(cols[: n + 1], n)
    return _cond_sub_p(spec, out)


@_jit_spec
def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@_jit_spec
def mont_pow5(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """x^5 (the Poseidon S-box) in Montgomery form: 3 multiplications."""
    a2 = mont_mul(spec, a, a)
    a4 = mont_mul(spec, a2, a2)
    return mont_mul(spec, a4, a)


@_jit_spec(static=(0, 2))
def mont_pow(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent (static Python-int exponent) via an MSB-first bit scan."""
    if exponent == 0:
        return jnp.broadcast_to(_const(spec.r_limbs, a.ndim), a.shape)
    bits = np.array(
        [(exponent >> i) & 1 for i in reversed(range(exponent.bit_length()))],
        dtype=np.bool_,
    )
    one = jnp.broadcast_to(_const(spec.r_limbs, a.ndim), a.shape)

    def body(acc, bit):
        acc = mont_mul(spec, acc, acc)
        acc = select(jnp.broadcast_to(bit, acc.shape[1:]), mont_mul(spec, acc, a), acc)
        return acc, None

    acc, _ = lax.scan(body, one, jnp.asarray(bits))
    return acc


@_jit_spec
def mont_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse by Fermat: a^(p-2). Maps 0 -> 0 (projective-friendly)."""
    return mont_pow(spec, a, spec.modulus - 2)


# ---------------------------------------------------------------------------
# Montgomery-domain conversions
# ---------------------------------------------------------------------------


@_jit_spec
def to_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, x, _const(spec.r2_limbs, x.ndim))


@_jit_spec
def from_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros_like(x).at[0].set(1)
    return mont_mul(spec, x, one)


def pack_mont(spec: FieldSpec, values) -> np.ndarray:
    """Python ints -> Montgomery-form limb array (host-side).

    Uses the native C++ converter (openzl_tpu.native) when built; falls back
    to the per-element Python loop."""
    arr = np.asarray(values, dtype=object)
    try:
        from .. import native

        out = native.to_mont_limbs(spec, arr)
        if out is not None:
            return out
    except Exception:
        pass
    out = np.zeros((spec.n_limbs,) + arr.shape, dtype=np.uint32)
    for idx in np.ndindex(arr.shape):
        out[(slice(None),) + idx] = int_to_limbs(
            spec.to_mont(int(arr[idx]) % spec.modulus), spec.n_limbs
        )
    return out


def unpack_mont(spec: FieldSpec, limbs) -> np.ndarray:
    """Montgomery-form limb array -> object array of canonical Python ints."""
    try:
        from .. import native

        out = native.from_mont_limbs(spec, np.asarray(limbs))
        if out is not None:
            return out
    except Exception:
        pass
    out = unpack(spec, limbs)
    if out.shape == ():
        return np.array(spec.from_mont(int(out)), dtype=object)
    for idx in np.ndindex(out.shape):
        out[idx] = spec.from_mont(out[idx])
    return out
