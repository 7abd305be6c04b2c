"""Pallas TPU kernel for the batched Poseidon2 permutation.

Poseidon2's linear layers are small-integer matrices (crypto/poseidon2),
so this kernel spends Montgomery multiplications ONLY on S-boxes: width 3
does 240 montmuls/permutation versus 804 for classic Poseidon — the linear
layers reduce to limb additions (plus one doubling per internal diagonal
entry > 1). Same VMEM-resident design as ops/poseidon_kernel.py: one grid
step loads a (sublane, lane) batch tile once, runs all rounds in-core, and
writes back once; state lanes are separate operands threaded as a tuple
through `fori_loop`s.

Round constants live in VMEM, dynamically indexed per round; the internal
diagonal and the external matrix are static Python ints baked into the
trace (they are tiny: shift-and-add chains).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.poseidon2 import Poseidon2, external_matrix
from .poseidon_kernel import (
    _LANES,
    _k_add,
    _k_pow5,
    from_lanes,
    to_lanes,
)


def _small_mul(p, x, c: int):
    """Multiply by a tiny positive integer via double-and-add."""
    assert c >= 1
    acc = None
    dbl = x
    while c:
        if c & 1:
            acc = dbl if acc is None else _k_add(p, acc, dbl)
        c >>= 1
        if c:
            dbl = _k_add(p, dbl, dbl)
    return acc


def _kernel(perm: Poseidon2, *refs):
    width = perm.width
    p_ref, ext_ref, int_ref = refs[0], refs[1], refs[2]
    in_refs = refs[3 : 3 + width]
    out_refs = refs[3 + width :]

    p = p_ref[:]  # (n, 1, 1)
    n0inv = np.uint32(perm.spec.n0inv)
    half = perm.full_rounds // 2
    diag = perm.diag

    def ext_layer(xs):
        if width in (2, 3):
            s = xs[0]
            for i in range(1, width):
                s = _k_add(p, s, xs[i])
            return tuple(_k_add(p, x, s) for x in xs)
        me = external_matrix(width)
        out = []
        for i in range(width):
            acc = _small_mul(p, xs[0], me[i][0])
            for j in range(1, width):
                acc = _k_add(p, acc, _small_mul(p, xs[j], me[i][j]))
            out.append(acc)
        return tuple(out)

    def int_layer(xs):
        s = xs[0]
        for i in range(1, width):
            s = _k_add(p, s, xs[i])
        return tuple(
            _k_add(p, s, _small_mul(p, xs[i], diag[i])) for i in range(width)
        )

    def ext_round(r, st):
        kr = ext_ref[r]  # (w, n, 1, 1)
        xs = [_k_pow5(p, n0inv, _k_add(p, st[w], kr[w])) for w in range(width)]
        return ext_layer(xs)

    def int_round(r, st):
        x0 = _k_pow5(p, n0inv, _k_add(p, st[0], int_ref[r]))
        return int_layer((x0,) + tuple(st[1:]))

    st = tuple(ref[0] for ref in in_refs)  # each (n, S, L)
    st = ext_layer(st)
    st = lax.fori_loop(0, half, ext_round, st)
    st = lax.fori_loop(0, perm.partial_rounds, int_round, st)
    st = lax.fori_loop(half, perm.full_rounds, ext_round, st)
    for w in range(width):
        out_refs[w][0] = st[w]


def permute_lanes(perm: Poseidon2, lanes, interpret: bool = False):
    """Permutation in kernel layout: width-tuple of (n_blocks, n, S, L)."""
    return _permute_lanes_jit(perm, tuple(lanes), interpret=interpret)


@functools.partial(jax.jit, static_argnums=0, static_argnames=("interpret",))
def _permute_lanes_jit(perm: Poseidon2, lanes, interpret: bool = False):
    n_blocks, n, S, L = lanes[0].shape
    width = perm.width
    p_arr = jnp.asarray(perm.spec.p_limbs)[:, None, None]
    ext = jnp.swapaxes(jnp.asarray(perm.ext_keys), 1, 2)[..., None, None]
    ints = jnp.asarray(perm.int_keys)[..., None, None]
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
    )(p_arr, ext, ints, *lanes)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 2), static_argnames=("interpret",))
def permute(
    perm: Poseidon2,
    state: jnp.ndarray,
    block_sublanes: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched Poseidon2 on TPU: state (n_limbs, width, B) -> same.

    B must be a multiple of block_sublanes * 128 (pad externally).
    """
    n, width, B = state.shape
    tile = block_sublanes * _LANES
    assert B % tile == 0, f"batch {B} not a multiple of {tile}"
    lanes = to_lanes(state, block_sublanes)
    out = permute_lanes(perm, lanes, interpret=interpret)
    return from_lanes(out)


def hash_batch(
    perm: Poseidon2, inputs: jnp.ndarray, block_sublanes: int = 32
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
