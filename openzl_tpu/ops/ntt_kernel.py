"""Pallas TPU kernels for the NTT hot path: fused butterfly + pointwise mul.

Why a kernel: the jnp NTT stage body (`ops/ntt.py`) evaluates `mont_mul`
as ~50 separate full-width XLA ops, each materializing an
(n_limbs, N/2)-shaped temporary in HBM — at N = 2^22 a single stage moves
tens of GB and the 22-stage transform lands ~180x above its montmul
roofline. Here one grid step loads a (sublane x lane) tile of the u/t
halves and the gathered twiddles into VMEM and computes the whole butterfly
	lo = u + t,  hi = (u - t) * w
in-core, so per stage the only HBM traffic is one read of the operands and
one write of the two results.

The limb arithmetic is shared with the Poseidon/EC kernels
(`ops/poseidon_kernel.py` documents the lazy-u32-column overflow analysis;
`ops/ec_kernel.py` the modular subtract). The modulus is a kernel operand
shaped (n, 1, 1) — Pallas forbids captured array constants.

Replaces the hot inner loop of ark-poly's radix-2 FFT (reference Groth16
H-polynomial path, SURVEY.md section 3.2).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.spec import FieldSpec
from .ec_kernel import _k_sub
from .poseidon_kernel import _k_add, _k_mont_mul
from ..utils.aot_cache import aot_jit

_LANES = 128
#: (32, 128) is the measured montmul throughput sweet spot (docs/performance.md)
_SUBLANES = 32
_TILE = _SUBLANES * _LANES


def _make_butterfly_kernel(n0inv: int):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, u_ref, t_ref, tw_ref, lo_ref, hi_ref):
        p = p_ref[...]
        u, t = u_ref[...], t_ref[...]
        lo_ref[...] = _k_add(p, u, t)
        hi_ref[...] = _k_mont_mul(p, n0, _k_sub(p, u, t), tw_ref[...])

    return kernel


def _make_mul_kernel(n0inv: int, scale: bool):
    n0 = np.uint32(n0inv)

    def kernel(p_ref, a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        if scale:  # b is a single (n, 1, 1) field element
            b = jnp.broadcast_to(b, a.shape)
        o_ref[...] = _k_mont_mul(p_ref[...], n0, a, b)

    return kernel


@functools.partial(aot_jit, static_argnums=(0, 1, 2))
def _call(spec: FieldSpec, mode: str, interpret: bool, *ops):
    """mode: 'butterfly' | 'mul' | 'scale'. ops: flat (n, N) arrays
    (N a multiple of _TILE), except a trailing (n, 1) operand in scale
    mode."""
    n = spec.n_limbs
    p3 = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(n, 1, 1)
    N = ops[0].shape[-1]
    S = N // _LANES
    g = S // _SUBLANES

    blk = pl.BlockSpec(
        (n, _SUBLANES, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec((n, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    if mode == "butterfly":
        kernel = _make_butterfly_kernel(spec.n0inv)
        in_specs = [small, blk, blk, blk]
        shaped = [o.reshape(n, S, _LANES) for o in ops]
        n_out = 2
    elif mode == "mul":
        kernel = _make_mul_kernel(spec.n0inv, scale=False)
        in_specs = [small, blk, blk]
        shaped = [o.reshape(n, S, _LANES) for o in ops]
        n_out = 1
    else:  # scale
        kernel = _make_mul_kernel(spec.n0inv, scale=True)
        in_specs = [small, blk, small]
        shaped = [ops[0].reshape(n, S, _LANES), ops[1].reshape(n, 1, 1)]
        n_out = 1

    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=[blk] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n, S, _LANES), jnp.uint32)] * n_out,
        interpret=interpret,
    )(jnp.asarray(p3), *shaped)
    return tuple(o.reshape(n, N) for o in outs)


def _flatten_pad(arrs):
    """Flatten (n, *batch) operands and zero-pad the batch to _TILE."""
    n = arrs[0].shape[0]
    batch = arrs[0].shape[1:]
    size = int(np.prod(batch)) if batch else 1
    padded = -(-size // _TILE) * _TILE
    flat = []
    for a in arrs:
        f = a.reshape(n, size)
        if padded != size:
            f = jnp.concatenate(
                [f, jnp.zeros((n, padded - size), jnp.uint32)], axis=1
            )
        flat.append(f)
    return flat, batch, size


# ---------------------------------------------------------------------------
# fused small-NTT kernel: ALL log2(M) DIF stages of an M-point transform in
# one VMEM-resident grid step
# ---------------------------------------------------------------------------
#
# The per-stage butterfly kernel above still pays one XLA round-trip per
# stage (interleave stack/reshape + twiddle gather ~2 ms/stage at 2^18).
# Decimation-in-frequency butterflies write results IN PLACE (lo at i, hi at
# i+h), so a whole M-point transform needs no inter-stage shuffles: stage s
# just reshapes the sublane axis (n, M, L) -> (n, blocks, 2, h, L) — a
# block-structured view Mosaic lowers without gathers (the pair-adjacent
# interleave of the per-stage path is exactly what it rejects).
#
# Output is bit-reversed along the M axis; callers (the four-step driver in
# ops/ntt.py) fold that into one final host-precomputed permutation.

#: max fused transform length. Mosaic stack-allocates every unrolled
#: stage's temporaries (33 montmul columns over the half-block per stage),
#: so scoped VMEM grows ~linearly with M: measured 80 MB at M=512 vs the
#: chip's 16 MB — M=64 keeps the whole 6-stage transform under the limit
_M_MAX = 64


#: below this butterfly half-width the 5-D reshape path slices fewer than 8
#: sublanes per block — Mosaic pads every op to (8, 128) tiles, costing ~8x.
#: Those stages instead run full-width: partner rows come from two sublane
#: rolls and a position mask, montmuls run on all M rows (2x the montmul
#: work of a half-width stage, but no sub-tile relayouts — measured net win)
_ROLL_H = 8


def _make_small_ntt_kernel(
    n0inv: int, M: int, L: int, interpret: bool, fused_tw: bool
):
    n0 = np.uint32(n0inv)
    log_m = M.bit_length() - 1
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(p_ref, x_ref, tw_ref, *rest):
        post_ref, o_ref = rest if fused_tw else (None, rest[0])
        n = p_ref.shape[0]
        p4 = p_ref[...].reshape(n, 1, 1, 1)
        p3 = p_ref[...]
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, M, 1), 1)
        x = x_ref[...]
        for s in range(log_m):
            h = M >> (s + 1)
            if h >= _ROLL_H:
                y = x.reshape(n, M // (2 * h), 2, h, L)
                u, t = y[:, :, 0], y[:, :, 1]
                tw = tw_ref[:, s, :h].reshape(n, 1, h, 1)
                lo = _k_add(p4, u, t)
                hi = _k_mont_mul(p4, n0, _k_sub(p4, u, t), tw)
                x = jnp.stack([lo, hi], axis=2).reshape(n, M, L)
            else:
                up = roll(x, M - h, 1)  # x[i+h] at row i
                dn = roll(x, h, 1)  # x[i-h] at row i
                tw = tw_ref[:, s, :].reshape(n, M, 1)
                lo = _k_add(p3, x, up)
                hi = _k_mont_mul(p3, n0, _k_sub(p3, dn, x), tw)
                x = jnp.where((iota & np.uint32(h)) == 0, lo, hi)
        if fused_tw:
            # four-step level twiddle fused in-core (rows arrive in this
            # kernel's bit-reversed output order; ops/ntt.py pre-permutes)
            x = _k_mont_mul(p3, n0, x, post_ref[...])
        o_ref[...] = x

    return kernel


@functools.partial(aot_jit, static_argnums=(0, 4))
def small_ntt(
    spec: FieldSpec,
    x: jnp.ndarray,
    stage_tw: jnp.ndarray,
    post_tw: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched M-point DIF NTT along axis 1 of x (n_limbs, M, Lanes).

    M <= _M_MAX a power of two, Lanes a multiple of 128. `stage_tw` is the
    (n_limbs, log2(M), M) per-stage twiddle table (`ops.ntt._stage_twiddles`
    documents the half-width vs full-width stage layouts). Output is the
    transform in BIT-REVERSED order along axis 1. `post_tw` (same shape as
    x, rows in that same bit-reversed order) is an optional elementwise
    Montgomery factor applied in-core after the last stage — the four-step
    driver fuses its level twiddle this way, saving one full HBM pass.
    """
    n, M, lanes = x.shape
    assert M & (M - 1) == 0 and M <= _M_MAX
    assert interpret or lanes % _LANES == 0
    L = lanes if interpret else _LANES  # interpret mode: one untiled block
    log_m = M.bit_length() - 1
    p3 = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(n, 1, 1)

    blk = pl.BlockSpec(
        (n, M, L), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec((n, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(
        (n, log_m, M), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    fused = post_tw is not None
    ops = (jnp.asarray(p3), x, stage_tw) + ((post_tw,) if fused else ())

    return pl.pallas_call(
        _make_small_ntt_kernel(spec.n0inv, M, L, interpret, fused),
        grid=(lanes // L,),
        in_specs=[small, blk, twspec] + ([blk] if fused else []),
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, M, lanes), jnp.uint32),
        interpret=interpret,
    )(*ops)


def butterfly(
    spec: FieldSpec,
    u: jnp.ndarray,
    t: jnp.ndarray,
    tw: jnp.ndarray,
    interpret: bool = False,
):
    """(u + t, (u - t) * tw) fused in VMEM; operands (n_limbs, *batch),
    values in Montgomery form, all the same shape."""
    flat, batch, size = _flatten_pad([u, t, tw])
    lo, hi = _call(spec, "butterfly", interpret, *flat)
    shape = (spec.n_limbs,) + batch
    return lo[:, :size].reshape(shape), hi[:, :size].reshape(shape)


def mont_mul(
    spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Elementwise Montgomery product a * b (same shapes), fused in VMEM."""
    flat, batch, size = _flatten_pad([a, b])
    (o,) = _call(spec, "mul", interpret, *flat)
    return o[:, :size].reshape((spec.n_limbs,) + batch)


def mont_scale(
    spec: FieldSpec, a: jnp.ndarray, s: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """a * s for a single field element s (n_limbs,) or (n_limbs, 1...)."""
    flat, batch, size = _flatten_pad([a])
    (o,) = _call(
        spec, "scale", interpret, flat[0], s.reshape(spec.n_limbs, 1)
    )
    return o[:, :size].reshape((spec.n_limbs,) + batch)
