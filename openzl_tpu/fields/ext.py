"""Field-ops abstraction: base field Fq and quadratic extension Fq2.

Generalizes the batched limb kernels so curve/MSM code is generic over the
coordinate field — G1 lives over Fq, G2 over Fq2 (reference: ark-ec curve
configs, SURVEY.md section 2.8). Values are uint32 limb arrays with the limb
axis FIRST (required by :mod:`openzl_tpu.fields.limb`) and the batch LAST:

  * Fq:  (n_limbs, *batch)
  * Fq2: (n_limbs, 2, *batch) — component axis 1 holds (c0, c1) for
    c0 + c1*u with u^2 = beta (-1 for the BN254/BLS12-381 towers, -5 for
    BLS12-377). The component axis is just another batch axis for the limb
    kernels, so add/sub/etc. apply componentwise with no reshuffling.

Every op broadcasts over the leading value axes; batch-structural ops
(take/scatter/slice/concat) act on the LAST axis, so the same Jacobian/MSM
code runs over either field by calling through the ops object.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Union

import numpy as np

import jax.numpy as jnp

from . import limb
from .spec import FieldSpec


class _BatchStructOps:
    """Batch-axis (last axis) structural ops shared by both fields."""

    def take(self, v, idx):
        return v[..., idx]

    def scatter_set(self, dst, idx, src):
        return dst.at[..., idx].set(src)

    def slice_batch(self, v, start, stop):
        return v[..., start:stop]

    def concat(self, vs):
        return jnp.concatenate(vs, axis=-1)

    def reverse(self, v):
        return v[..., ::-1]

    def broadcast_to_batch(self, v, batch_shape):
        return jnp.broadcast_to(v, v.shape[: self.value_ndim] + tuple(batch_shape))


@dataclasses.dataclass(frozen=True)
class FqOps(_BatchStructOps):
    """Base-field ops over Montgomery limb arrays, value shape (n_limbs, *b)."""

    spec: FieldSpec

    #: leading non-batch axes of a value (limb axis only)
    value_ndim = 1

    def from_ints(self, values) -> np.ndarray:
        return limb.pack_mont(self.spec, values)

    def to_ints(self, arr) -> np.ndarray:
        return limb.unpack_mont(self.spec, np.asarray(arr))

    def const(self, x: int, batch_ndim: int) -> jnp.ndarray:
        """Montgomery constant broadcastable over batch_ndim batch axes."""
        v = limb.pack_mont(self.spec, x % self.spec.modulus)
        return jnp.asarray(v).reshape(v.shape + (1,) * batch_ndim)

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return limb.zeros(self.spec, batch_shape)

    def one(self, batch_shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(
            self.const(1, len(batch_shape)),
            (self.spec.n_limbs,) + tuple(batch_shape),
        )

    def add(self, a, b):
        return limb.add(self.spec, a, b)

    def sub(self, a, b):
        return limb.sub(self.spec, a, b)

    def neg(self, a):
        return limb.neg(self.spec, a)

    def double(self, a):
        return limb.add(self.spec, a, a)

    def mul(self, a, b):
        # compact variant: curve/MSM graphs nest EC adds inside scans, so
        # trace size matters more than unrolled fusion here
        return limb.mont_mul_compact(self.spec, a, b)

    def sqr(self, a):
        return limb.mont_mul_compact(self.spec, a, a)

    def inv(self, a):
        return limb.mont_inv(self.spec, a)

    def is_zero(self, a) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b) -> jnp.ndarray:
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)


@dataclasses.dataclass(frozen=True)
class Fq2Ops(_BatchStructOps):
    """Quadratic extension c0 + c1*u, u^2 = beta; value shape (n_limbs, 2, *b).

    beta is a small negative non-residue: -1 for the BN254 / BLS12-381
    towers, -5 for BLS12-377 (arkworks fq2.rs configs). Multiplications by
    |beta| are addition chains, so any small beta costs the same 3 montmuls
    per Fq2 mul.
    """

    spec: FieldSpec
    beta: int = -1

    value_ndim = 2

    def _nr(self, x):
        """|beta| * x via doubling chain (|beta| is tiny and static)."""
        k = -self.beta
        assert k >= 1
        s = self.spec
        bit = x
        acc = None
        while k:
            if k & 1:
                acc = bit if acc is None else limb.add(s, acc, bit)
            k >>= 1
            if k:
                bit = limb.add(s, bit, bit)
        return acc

    @staticmethod
    def _c(v, i):
        return v[:, i]

    @staticmethod
    def _stack(c0, c1):
        return jnp.stack([c0, c1], axis=1)

    def from_ints(self, pairs) -> np.ndarray:
        """pairs: nested [...,(c0, c1)] ints, pair axis LAST in the input;
        returns (n_limbs, 2, *batch) with batch order preserved."""
        arr = np.asarray(pairs, dtype=object)  # (*batch, 2)
        packed = limb.pack_mont(self.spec, np.moveaxis(arr, -1, 0))  # (n, 2, *b)
        return packed

    def to_ints(self, v):
        """-> object array (*batch, 2) of canonical ints."""
        out = limb.unpack_mont(self.spec, np.asarray(v))  # (2, *batch)
        return np.moveaxis(out, 0, -1)

    def const(self, x, batch_ndim: int) -> jnp.ndarray:
        """x: int or (c0, c1) pair."""
        if isinstance(x, int):
            x = (x, 0)
        v = self.from_ints(np.array([x[0] % self.spec.modulus, x[1] % self.spec.modulus], dtype=object))
        return jnp.asarray(v).reshape(v.shape + (1,) * batch_ndim)

    def zeros(self, batch_shape=()):
        return jnp.zeros(
            (self.spec.n_limbs, 2) + tuple(batch_shape), dtype=jnp.uint32
        )

    def one(self, batch_shape=()):
        return jnp.broadcast_to(
            self.const(1, len(batch_shape)),
            (self.spec.n_limbs, 2) + tuple(batch_shape),
        )

    # componentwise ring ops: the pair axis is a batch axis for limb kernels
    def add(self, a, b):
        return limb.add(self.spec, a, b)

    def sub(self, a, b):
        return limb.sub(self.spec, a, b)

    def neg(self, a):
        return limb.neg(self.spec, a)

    def double(self, a):
        return limb.add(self.spec, a, a)

    def mul(self, a, b):
        """Karatsuba: (a0+a1 u)(b0+b1 u) = (a0b0 + beta a1b1) +
        ((a0+a1)(b0+b1) - a0b0 - a1b1) u."""
        s = self.spec
        a0, a1 = self._c(a, 0), self._c(a, 1)
        b0, b1 = self._c(b, 0), self._c(b, 1)
        m0 = limb.mont_mul_compact(s, a0, b0)
        m1 = limb.mont_mul_compact(s, a1, b1)
        m2 = limb.mont_mul_compact(s, limb.add(s, a0, a1), limb.add(s, b0, b1))
        c0 = limb.sub(s, m0, self._nr(m1))
        c1 = limb.sub(s, m2, limb.add(s, m0, m1))
        return self._stack(c0, c1)

    def sqr(self, a):
        """(a0+a1 u)^2 = ((a0+a1)(a0+beta a1) - (beta+1) a0a1) + 2 a0a1 u."""
        s = self.spec
        a0, a1 = self._c(a, 0), self._c(a, 1)
        t = limb.mont_mul_compact(
            s, limb.add(s, a0, a1), limb.sub(s, a0, self._nr(a1))
        )
        m = limb.mont_mul_compact(s, a0, a1)
        if self.beta == -1:
            c0 = t
        else:
            # t - (beta+1) m = t + (|beta| - 1) m
            k = -self.beta - 1
            extra = m
            for _ in range(k - 1):
                extra = limb.add(s, extra, m)
            c0 = limb.add(s, t, extra)
        return self._stack(c0, limb.add(s, m, m))

    def inv(self, a):
        """1/(a0+a1 u) = (a0 - a1 u) / (a0^2 - beta a1^2)."""
        s = self.spec
        a0, a1 = self._c(a, 0), self._c(a, 1)
        norm = limb.add(
            s,
            limb.mont_mul_compact(s, a0, a0),
            self._nr(limb.mont_mul_compact(s, a1, a1)),
        )
        ninv = limb.mont_inv(s, norm)
        return self._stack(
            limb.mont_mul_compact(s, a0, ninv),
            limb.neg(s, limb.mont_mul_compact(s, a1, ninv)),
        )

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(0, 1))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)


FieldOps = Union[FqOps, Fq2Ops]


@functools.lru_cache(maxsize=None)
def fq_ops(spec: FieldSpec) -> FqOps:
    return FqOps(spec)


@functools.lru_cache(maxsize=None)
def fq2_ops(spec: FieldSpec, beta: int = -1) -> Fq2Ops:
    return Fq2Ops(spec, beta)
