"""Dense univariate polynomials + radix-2 evaluation domains (ark-poly's
user surface — reference plugins/arkworks/Cargo.toml:139 `ark-poly`; the
transform core lives in ops/ntt.py).

`DensePoly` keeps coefficients as host ints (ascending degree) and
dispatches products above `_NTT_MUL_MIN` through the TPU NTT pipeline
(pack to Montgomery limbs, two forward transforms, one fused pointwise
Montgomery multiply, one inverse transform); small products stay on the
host schoolbook path. `Radix2Domain` mirrors ark-poly's
Radix2EvaluationDomain: element enumeration, vanishing-polynomial
evaluation, Lagrange coefficients at an arbitrary point, and (i)NTT
wrappers over the domain.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import FieldSpec
from . import ntt as nttmod

#: products with fewer result coefficients run host schoolbook; beyond it
#: the three-transform NTT product wins even with the host<->device round
#: trip (the O(n^2) bigint loop crosses the O(n log n) device cost here)
_NTT_MUL_MIN = 512

#: vanishing-poly divisions with at least this many quotient coefficients
#: run the device suffix-sum path (below it the pack/transfer round trip
#: dominates the host fold)
_VANISH_DIV_DEVICE_MIN = 1 << 12


def _vanishing_divide_device(
    spec: FieldSpec, cs: Sequence[int], n: int
) -> Tuple[List[int], List[int]]:
    """Device suffix-sum form of division by x^n - 1 (see
    DensePoly.divide_by_vanishing_poly). Returns (q, r) as host ints."""
    m = -(-len(cs) // n)  # chunks of stride n
    padded = list(cs) + [0] * (m * n - len(cs))
    arr = jnp.asarray(limb.pack(spec, np.array(padded, dtype=object)))
    chunked = arr.reshape(arr.shape[0], m, n)
    # reverse accumulation: after visiting chunk t the accumulator holds
    # sum_{k>=t} chunk_k; the value BEFORE adding chunk t is q's row t
    acc = limb.zeros(spec, (n,))
    q_rows = [None] * m
    for t in range(m - 1, -1, -1):
        q_rows[t] = acc
        acc = limb.add(spec, acc, chunked[:, t, :])
    q_arr = np.asarray(jnp.concatenate(q_rows, axis=1))
    r_arr = np.asarray(acc)
    q = [int(v) for v in limb.unpack(spec, q_arr)][: len(cs) - n]
    r = [int(v) for v in limb.unpack(spec, r_arr)]
    return q, r


@dataclasses.dataclass(frozen=True)
class Radix2Domain:
    """Multiplicative subgroup H = <w> of size 2^log_n (ark-poly
    Radix2EvaluationDomain)."""

    spec: FieldSpec
    log_n: int

    @classmethod
    def new(cls, spec: FieldSpec, min_size: int) -> "Radix2Domain":
        assert min_size >= 1, "domain must be non-empty"
        log_n = (min_size - 1).bit_length()  # size 1 -> log_n 0 (ark parity)
        assert log_n <= nttmod.two_adicity(spec), "field two-adicity exceeded"
        return cls(spec, log_n)

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def group_gen(self) -> int:
        return nttmod.group_gen(self.spec, self.log_n)

    def elements(self) -> List[int]:
        p, w = self.spec.modulus, self.group_gen
        out = [1] * self.size
        for i in range(1, self.size):
            out[i] = out[i - 1] * w % p
        return out

    def evaluate_vanishing(self, z: int) -> int:
        """Z_H(z) = z^n - 1."""
        p = self.spec.modulus
        return (pow(z % p, self.size, p) - 1) % p

    def lagrange_coeffs(self, z: int) -> List[int]:
        """L_i(z) for all i: Z_H(z)/n * w^i / (z - w^i); on-domain z
        degenerates to the indicator vector."""
        p = self.spec.modulus
        z %= p
        els = self.elements()
        vz = self.evaluate_vanishing(z)
        if vz == 0:  # z in H
            return [1 if e == z else 0 for e in els]
        scale = vz * pow(self.size, -1, p) % p
        # batched inversion of (z - w^i): one Fermat inverse total
        diffs = [(z - e) % p for e in els]
        pref = [1] * (self.size + 1)
        for i, d in enumerate(diffs):
            pref[i + 1] = pref[i] * d % p
        inv_all = pow(pref[-1], -1, p)
        out = [0] * self.size
        for i in range(self.size - 1, -1, -1):
            out[i] = scale * els[i] % p * (pref[i] * inv_all % p) % p
            inv_all = inv_all * diffs[i] % p
        return out

    # -- device transforms over the domain ----------------------------------

    def _pack(self, values: Sequence[int]) -> jnp.ndarray:
        vals = list(values) + [0] * (self.size - len(values))
        return jnp.asarray(
            limb.pack_mont(self.spec, np.array(vals, dtype=object))
        )

    def _unpack(self, x) -> List[int]:
        return [int(v) for v in limb.unpack_mont(self.spec, np.asarray(x))]

    def _values(self, values: Sequence[int]) -> List[int]:
        p = self.spec.modulus
        vals = [v % p for v in values] + [0] * (self.size - len(values))
        return vals

    def fft(self, coeffs: Sequence[int]) -> List[int]:
        if self.log_n == 0:  # size-1 domain: the transform is the identity
            return self._values(coeffs)
        return self._unpack(nttmod.ntt(self.spec, self._pack(coeffs)))

    def ifft(self, evals: Sequence[int]) -> List[int]:
        if self.log_n == 0:
            return self._values(evals)
        return self._unpack(nttmod.intt(self.spec, self._pack(evals)))

    def coset_fft(self, coeffs: Sequence[int]) -> List[int]:
        if self.log_n == 0:  # size-1 coset {g}: p is constant, p(g) = c0
            return self._values(coeffs)
        return self._unpack(nttmod.coset_ntt(self.spec, self._pack(coeffs)))

    def coset_ifft(self, evals: Sequence[int]) -> List[int]:
        if self.log_n == 0:
            return self._values(evals)
        return self._unpack(nttmod.coset_intt(self.spec, self._pack(evals)))


class DensePoly:
    """Host-resident dense polynomial (ascending coefficients) with
    device-dispatched large products (ark-poly DensePolynomial)."""

    __slots__ = ("spec", "coeffs")

    def __init__(self, spec: FieldSpec, coeffs: Sequence[int]):
        p = spec.modulus
        cs = [c % p for c in coeffs]
        while cs and cs[-1] == 0:
            cs.pop()
        self.spec = spec
        self.coeffs = cs

    # -- constructors --------------------------------------------------------

    @classmethod
    def zero(cls, spec: FieldSpec) -> "DensePoly":
        return cls(spec, [])

    @classmethod
    def rand(cls, spec: FieldSpec, degree: int, rng) -> "DensePoly":
        p = spec.modulus
        cs = [rng.randrange(p) for _ in range(degree + 1)]
        if cs and cs[-1] == 0:
            cs[-1] = 1
        return cls(spec, cs)

    @classmethod
    def from_evals(
        cls, domain: Radix2Domain, evals: Sequence[int]
    ) -> "DensePoly":
        """Interpolate through evaluations on `domain` (one iNTT)."""
        assert len(evals) == domain.size
        return cls(domain.spec, domain.ifft(evals))

    # -- basic algebra -------------------------------------------------------

    @property
    def degree(self) -> int:
        """-1 for the zero polynomial (ark returns 0; the -1 convention
        keeps degree(a*b) == degree(a)+degree(b) total)."""
        return len(self.coeffs) - 1

    def is_zero(self) -> bool:
        return not self.coeffs

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, DensePoly)
            and self.spec is other.spec
            and self.coeffs == other.coeffs
        )

    def __add__(self, other: "DensePoly") -> "DensePoly":
        p = self.spec.modulus
        a, b = self.coeffs, other.coeffs
        if len(a) < len(b):
            a, b = b, a
        out = list(a)
        for i, c in enumerate(b):
            out[i] = (out[i] + c) % p
        return DensePoly(self.spec, out)

    def __neg__(self) -> "DensePoly":
        p = self.spec.modulus
        return DensePoly(self.spec, [(-c) % p for c in self.coeffs])

    def __sub__(self, other: "DensePoly") -> "DensePoly":
        return self + (-other)

    def scale(self, k: int) -> "DensePoly":
        p = self.spec.modulus
        k %= p
        return DensePoly(self.spec, [c * k % p for c in self.coeffs])

    def __mul__(self, other: "DensePoly") -> "DensePoly":
        if self.is_zero() or other.is_zero():
            return DensePoly.zero(self.spec)
        p = self.spec.modulus
        out_len = len(self.coeffs) + len(other.coeffs) - 1
        if out_len < _NTT_MUL_MIN:
            out = [0] * out_len
            for i, a in enumerate(self.coeffs):
                if not a:
                    continue
                for j, b in enumerate(other.coeffs):
                    out[i + j] = (out[i + j] + a * b) % p
            return DensePoly(self.spec, out)
        dom = Radix2Domain.new(self.spec, out_len)
        ea = nttmod.ntt(self.spec, dom._pack(self.coeffs))
        eb = nttmod.ntt(self.spec, dom._pack(other.coeffs))
        prod = nttmod.intt(self.spec, limb.mont_mul(self.spec, ea, eb))
        return DensePoly(self.spec, dom._unpack(prod)[:out_len])

    # -- evaluation / division ----------------------------------------------

    def evaluate(self, z: int) -> int:
        p = self.spec.modulus
        z %= p
        acc = 0
        for c in reversed(self.coeffs):
            acc = (acc * z + c) % p
        return acc

    def divide_with_q_and_r(
        self, divisor: "DensePoly"
    ) -> Tuple["DensePoly", "DensePoly"]:
        """Euclidean division: self = q * divisor + r, deg r < deg divisor."""
        assert not divisor.is_zero(), "division by zero polynomial"
        p = self.spec.modulus
        rem = list(self.coeffs)
        d = divisor.coeffs
        dq = len(rem) - len(d)
        if dq < 0:
            return DensePoly.zero(self.spec), self
        q = [0] * (dq + 1)
        lead_inv = pow(d[-1], -1, p)
        for k in range(dq, -1, -1):
            q[k] = rem[k + len(d) - 1] * lead_inv % p
            if not q[k]:
                continue
            for j, dj in enumerate(d):
                rem[k + j] = (rem[k + j] - q[k] * dj) % p
        return DensePoly(self.spec, q), DensePoly(self.spec, rem)

    def divide_by_vanishing_poly(
        self, domain: Radix2Domain, device: bool = None
    ) -> Tuple["DensePoly", "DensePoly"]:
        """Divide by Z_H = x^n - 1 in O(len) (ark-poly's specialization):
        folding coefficient i+n into coefficient i of the quotient.

        The fold q[i] = cs[i+n] + q[i+n] telescopes to a SUFFIX SUM over
        the n-strided chunks of the coefficient vector — q[j+tn] =
        sum_{k>t} cs[j+kn] and r[j] = sum_{k>=0} cs[j+kn] — so the device
        path reshapes the packed limbs to (chunks, n) and runs one
        chained mod-add reduction per chunk row (a single fused XLA
        dispatch; the host path is a serial Python bigint loop)."""
        p = self.spec.modulus
        n = domain.size
        cs = self.coeffs
        if len(cs) <= n:
            return DensePoly.zero(self.spec), self
        if device is None:
            device = len(cs) - n >= _VANISH_DIV_DEVICE_MIN
        if device:
            q, r = _vanishing_divide_device(self.spec, cs, n)
            return DensePoly(self.spec, q), DensePoly(self.spec, r)
        q = [0] * (len(cs) - n)
        for i in range(len(q) - 1, -1, -1):
            q[i] = (cs[i + n] + (q[i + n] if i + n < len(q) else 0)) % p
        r = [(cs[i] + q[i]) % p if i < len(q) else cs[i] for i in range(n)]
        return DensePoly(self.spec, q), DensePoly(self.spec, r)
