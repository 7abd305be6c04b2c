"""Poseidon2 permutation (Grassi-Khovratovich-Schofnegger 2023), TPU-first.

Why it exists here: the classic Poseidon partial round pays a dense width^2
MDS product (or 2*width-1 after the sparse factorization); Poseidon2 replaces
both linear layers with matrices whose entries are tiny integers, so on TPU
every linear layer is pure limb additions — the only multiplications left in
the whole permutation are the S-boxes. For width 3 that cuts ~804 Montgomery
multiplications per permutation to 240, which is what lets a v5e chip clear
the 5M perms/s north-star (BASELINE.md names "Poseidon-2 permutation
throughput" as the headline metric).

Structure (paper §3): an initial external-matrix layer, then

  * external (full) rounds: add per-element constants, S-box all, M_E
  * internal (partial) rounds: add constant to element 0, S-box element 0, M_I

Matrices (paper §5.2-5.3):
  * t=2: M_E = circ(2,1),   M_I = [[2,1],[1,3]]
  * t=3: M_E = circ(2,1,1), M_I = [[2,1,1],[1,2,1],[1,1,3]]
  * t=4k: M_E = circ(2*M4, M4, ...), M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],
    [1,1,4,6]]; M_I = ones + diag(mu) with small mu searched at generation
    time subject to the invariant-subspace check (irreducible characteristic
    polynomial over F_p, checked for M_I^k up to k=t).

Round constants are Grain-LFSR generated with the classic Poseidon seeding
(crypto/poseidon/param_gen.py); external rounds consume ``width`` constants
each, internal rounds one each. Round numbers follow the same security
search as classic Poseidon (crypto/poseidon/constants.py) with the paper's
recommended Groebner margin.

This primitive has no counterpart in the reference (openzl implements
classic Poseidon only — openzl-crypto/src/poseidon/); it is an addition, and
the classic permutation remains the reference-conformance anchor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import numpy as np

import jax.numpy as jnp
from jax import lax

from ...fields import limb
from ...fields.spec import FieldSpec
from ..poseidon import param_gen
from ..poseidon.matrix import matmul as _matmul

__all__ = [
    "Poseidon2",
    "external_matrix",
    "internal_matrix",
    "permute_ints",
]


_M4 = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]

#: Poseidon2 round numbers at 128-bit security, alpha=5, ~254-bit moduli
#: (paper Table 1: R_F=8 throughout; R_P=56 for t in {2,3,4}, 57 for t in
#: {8,12,16}). Validated against crypto/poseidon/constants.py's search with
#: the paper's margin in tests/test_poseidon2.py.
ROUND_NUMBERS_128 = {2: (8, 56), 3: (8, 56), 4: (8, 56), 8: (8, 57), 12: (8, 57)}


def external_matrix(width: int) -> List[List[int]]:
    """M_E as small integers (paper §5.2)."""
    if width == 2:
        return [[2, 1], [1, 2]]
    if width == 3:
        return [[2, 1, 1], [1, 2, 1], [1, 1, 2]]
    assert width % 4 == 0, "Poseidon2 supports t in {2, 3} or multiples of 4"
    k = width // 4
    out = [[0] * width for _ in range(width)]
    for bi in range(k):
        for bj in range(k):
            scale = 2 if bi == bj else 1
            for r in range(4):
                for c in range(4):
                    out[4 * bi + r][4 * bj + c] = scale * _M4[r][c]
    return out


def _det(p: int, m: List[List[int]]) -> int:
    """Determinant mod p by Gaussian elimination with row swaps."""
    n = len(m)
    a = [list(row) for row in m]
    det = 1
    for col in range(n):
        pivot = next((r for r in range(col, n) if a[r][col] % p), None)
        if pivot is None:
            return 0
        if pivot != col:
            a[col], a[pivot] = a[pivot], a[col]
            det = -det
        det = det * a[col][col] % p
        inv = pow(a[col][col], -1, p)
        for r in range(col + 1, n):
            f = a[r][col] * inv % p
            if f:
                a[r] = [(x - f * y) % p for x, y in zip(a[r], a[col])]
    return det % p


def _char_poly(p: int, m: List[List[int]]) -> List[int]:
    """Characteristic polynomial det(xI - m) over F_p, coefficients
    low-to-high (monic), by evaluation at t+1 points + Lagrange
    interpolation — robust and cheap at the widths used here."""
    t = len(m)
    xs = list(range(t + 1))
    ys = []
    for x in xs:
        shifted = [[(x * (i == j) - m[i][j]) % p for j in range(t)] for i in range(t)]
        ys.append(_det(p, shifted))
    # Lagrange interpolation on the small integer points
    coeffs = [0] * (t + 1)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        # numerator polynomial prod_{j!=i} (x - xj), denominator scalar
        num = [1]
        denom = 1
        for j, xj in enumerate(xs):
            if j == i:
                continue
            num = [
                ((num[k - 1] if k else 0) - xj * (num[k] if k < len(num) else 0)) % p
                for k in range(len(num) + 1)
            ]
            denom = denom * (xi - xj) % p
        scale = yi * pow(denom, -1, p) % p
        for k in range(len(num)):
            coeffs[k] = (coeffs[k] + scale * num[k]) % p
    return coeffs


def _poly_mulmod(p: int, a: List[int], b: List[int], f: List[int]) -> List[int]:
    """(a*b) mod f over F_p; f monic degree t, a,b degree < t."""
    t = len(f) - 1
    out = [0] * (2 * t - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % p
    for d in range(len(out) - 1, t - 1, -1):
        c = out[d]
        if c:
            out[d] = 0
            for j in range(t):
                out[d - t + j] = (out[d - t + j] - c * f[j]) % p
    return out[:t]


def _xp_pow(p: int, f: List[int], reps: int) -> List[int]:
    """x^(p^reps) mod f via repeated Frobenius (square-and-multiply on the
    binary expansion of p, reps times)."""
    t = len(f) - 1
    cur = [0, 1] + [0] * (t - 2) if t >= 2 else [0]
    for _ in range(reps):
        base = cur
        acc = [1] + [0] * (t - 1)
        e = p
        while e:
            if e & 1:
                acc = _poly_mulmod(p, acc, base, f)
            base = _poly_mulmod(p, base, base, f)
            e >>= 1
        cur = acc
    return cur


def _poly_gcd_deg(p: int, a: List[int], b: List[int]) -> int:
    """Degree of gcd(a, b) over F_p (only the degree is needed)."""

    def deg(x):
        for i in range(len(x) - 1, -1, -1):
            if x[i] % p:
                return i
        return -1

    a, b = list(a), list(b)
    while deg(b) >= 0:
        da, db = deg(a), deg(b)
        if da < db:
            a, b = b, a
            continue
        inv = pow(b[deg(b)], -1, p)
        shift = da - db
        f = a[da] * inv % p
        for i in range(db + 1):
            a[i + shift] = (a[i + shift] - f * b[i]) % p
        if deg(a) < deg(b):
            a, b = b, a
    return deg(a)


def _is_irreducible(p: int, f: List[int]) -> bool:
    """Rabin's test for monic f over F_p."""
    t = len(f) - 1
    if t == 1:
        return True
    x = [0, 1] + [0] * (t - 2)
    xq = _xp_pow(p, f, t)
    diff = [(a - b) % p for a, b in zip(xq, x)]
    if any(diff):
        return False
    primes = {q for q in range(2, t + 1) if t % q == 0 and all(q % r for r in range(2, q))}
    for q in primes:
        xq = _xp_pow(p, f, t // q)
        diff = [(a - b) % p for a, b in zip(xq, x)]
        diff = diff + [0]  # degree < t; gcd with f
        if _poly_gcd_deg(p, f, diff) > 0:
            return False
    return True


def _internal_secure(p: int, m: List[List[int]], width: int) -> bool:
    """Invariant-subspace check (paper §5.3 / instance-generation scripts):
    the characteristic polynomials of M_I^k for k = 1..width must be
    irreducible over F_p."""
    mk = m
    for _ in range(width):
        if not _is_irreducible(p, _char_poly(p, mk)):
            return False
        mk = _matmul(p, mk, m)
    return True


@functools.lru_cache(maxsize=None)
def internal_matrix(p: int, width: int) -> tuple:
    """M_I = ones + diag(mu) with the smallest secure small-integer diagonal.

    For t in {2, 3} the paper's fixed matrices are tried first; all
    candidates pass through the invariant-subspace check for the concrete
    field, and the search walks small diagonals until one passes. Returns
    the diagonal (mu_i + 1 appears on the diagonal of the dense matrix).
    """
    # Distinct small diagonals: repeated mu_i always yield the eigenvector
    # e_i - e_j (sum 0, D v = mu v), i.e. a rational invariant subspace.
    # Candidates must also differ by more than a uniform shift — adding b to
    # every entry maps M to M + b*I, which only translates the
    # characteristic polynomial and preserves its factorization pattern.
    import itertools

    candidates = itertools.combinations(range(1, 48), width)
    for diag in candidates:
        m = [[1] * width for _ in range(width)]
        for i in range(width):
            m[i][i] = 1 + diag[i]
        if _internal_secure(p, m, width):
            return tuple(diag)
    raise ValueError(f"no secure small internal diagonal found for t={width}")


def _internal_dense(diag: Sequence[int], width: int) -> List[List[int]]:
    m = [[1] * width for _ in range(width)]
    for i in range(width):
        m[i][i] = 1 + diag[i]
    return m


# ---------------------------------------------------------------------------
# pure-int oracle
# ---------------------------------------------------------------------------


def permute_ints(
    spec: FieldSpec,
    width: int,
    full_rounds: int,
    partial_rounds: int,
    ext_keys: Sequence[Sequence[int]],
    int_keys: Sequence[int],
    state: Sequence[int],
) -> List[int]:
    """Python-int Poseidon2 oracle (test reference for the jnp/Pallas paths)."""
    p = spec.modulus
    me = external_matrix(width)
    mi = _internal_dense(internal_matrix(p, width), width)
    half = full_rounds // 2

    def mul(m, v):
        return [sum(m[i][j] * v[j] for j in range(width)) % p for i in range(width)]

    st = [x % p for x in state]
    st = mul(me, st)
    for r in range(half):
        st = [(x + k) % p for x, k in zip(st, ext_keys[r])]
        st = mul(me, [pow(x, 5, p) for x in st])
    for r in range(partial_rounds):
        st[0] = pow((st[0] + int_keys[r]) % p, 5, p)
        st = mul(mi, st)
    for r in range(half, full_rounds):
        st = [(x + k) % p for x, k in zip(st, ext_keys[r])]
        st = mul(me, [pow(x, 5, p) for x in st])
    return st


# ---------------------------------------------------------------------------
# device instance
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class Poseidon2:
    """Poseidon2 instance with device-resident Montgomery parameters.

    eq=False: identity hashing so instances work as jit static args
    (create() is lru_cached)."""

    spec: FieldSpec
    width: int
    full_rounds: int
    partial_rounds: int
    ext_keys: np.ndarray  # (R_F, n_limbs, width) uint32 Montgomery
    int_keys: np.ndarray  # (R_P, n_limbs) uint32 Montgomery
    diag: tuple  # internal diagonal mu (small ints)
    ext_keys_int: tuple  # python ints, for the oracle/gadget paths
    int_keys_int: tuple

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds

    @property
    def arity(self) -> int:
        return self.width - 1

    @classmethod
    @functools.lru_cache(maxsize=None)
    def create(
        cls,
        spec: FieldSpec,
        arity: int,
        full_rounds: int | None = None,
        partial_rounds: int | None = None,
    ) -> "Poseidon2":
        width = arity + 1
        if full_rounds is None or partial_rounds is None:
            full_rounds, partial_rounds = ROUND_NUMBERS_128[width]
        # Grain LFSR with the classic seeding; R_F*width + R_P constants.
        lfsr = param_gen.generate_lfsr(spec.bits, width, full_rounds, partial_rounds)
        n_ext = full_rounds * width
        flat = [
            param_gen.sample_field_element(lfsr, spec)
            for _ in range(n_ext + partial_rounds)
        ]
        ext = [flat[r * width : (r + 1) * width] for r in range(full_rounds)]
        ints = flat[n_ext:]
        diag = internal_matrix(spec.modulus, width)
        ext_arr = np.moveaxis(
            limb.pack_mont(spec, np.array(ext, dtype=object)), 0, 1
        )  # (R_F, n, w)
        int_arr = np.moveaxis(
            limb.pack_mont(spec, np.array(ints, dtype=object)), 0, 1
        )  # (R_P, n)
        return cls(
            spec, width, full_rounds, partial_rounds, ext_arr, int_arr,
            diag, tuple(tuple(r) for r in ext), tuple(ints),
        )

    # -- jnp compute path (state (n, w, batch), Montgomery limbs) ---------

    def _small_mul(self, x: jnp.ndarray, c: int) -> jnp.ndarray:
        """Multiply by a tiny integer constant with doublings and adds."""
        spec = self.spec
        assert c >= 1
        if c == 1:
            return x
        acc = None
        dbl = x
        while c:
            if c & 1:
                acc = dbl if acc is None else limb.add(spec, acc, dbl)
            c >>= 1
            if c:
                dbl = limb.add(spec, dbl, dbl)
        return acc

    def _ext_layer(self, state: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        w = self.width
        if w in (2, 3):
            s = state[:, 0]
            for i in range(1, w):
                s = limb.add(spec, s, state[:, i])
            return limb.add(spec, state, s[:, None])
        # t = 4k: y = circ(2*M4, M4, ...) @ x — per the paper, compute
        # M4-block products then add the running block sum.
        me = external_matrix(w)
        cols = []
        for i in range(w):
            acc = self._small_mul(state[:, 0], me[i][0])
            for j in range(1, w):
                acc = limb.add(spec, acc, self._small_mul(state[:, j], me[i][j]))
            cols.append(acc)
        return jnp.stack(cols, axis=1)

    def _int_layer(self, state: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        w = self.width
        s = state[:, 0]
        for i in range(1, w):
            s = limb.add(spec, s, state[:, i])
        cols = [
            limb.add(spec, s, self._small_mul(state[:, i], self.diag[i]))
            for i in range(w)
        ]
        return jnp.stack(cols, axis=1)

    def _ext_round(self, state: jnp.ndarray, keys: jnp.ndarray):
        spec = self.spec
        state = limb.add(spec, state, keys[..., None])
        state = limb.mont_pow5(spec, state)
        return self._ext_layer(state), None

    def _int_round(self, state: jnp.ndarray, key: jnp.ndarray):
        spec = self.spec
        head = limb.add(spec, state[:, :1], key[:, None, None])
        head = limb.mont_pow5(spec, head)
        state = jnp.concatenate([head, state[:, 1:]], axis=1)
        return self._int_layer(state), None

    def permute(self, state: jnp.ndarray) -> jnp.ndarray:
        """state (n_limbs, width, *batch) Montgomery -> same shape."""
        squeeze = state.ndim == 2
        if squeeze:
            state = state[..., None]
        batch = state.shape[2:]
        state = state.reshape(state.shape[:2] + (-1,))

        half = self.full_rounds // 2
        ext = jnp.asarray(self.ext_keys)
        state = self._ext_layer(state)
        state, _ = lax.scan(self._ext_round, state, ext[:half])
        state, _ = lax.scan(self._int_round, state, jnp.asarray(self.int_keys))
        state, _ = lax.scan(self._ext_round, state, ext[half:])

        state = state.reshape(state.shape[:2] + batch)
        return state[..., 0] if squeeze else state

    def domain_tag_mont(self) -> np.ndarray:
        """Same 2^arity - 1 tag convention as classic Poseidon."""
        return limb.pack_mont(self.spec, (1 << self.arity) - 1)

    def hash(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (n_limbs, arity, *batch) -> (n_limbs, *batch) digest."""
        squeeze = inputs.ndim == 2
        if squeeze:
            inputs = inputs[..., None]
        batch = inputs.shape[2:]
        tag = jnp.broadcast_to(
            jnp.asarray(self.domain_tag_mont()).reshape(
                (self.spec.n_limbs, 1) + (1,) * len(batch)
            ),
            (self.spec.n_limbs, 1) + batch,
        )
        state = self.permute(jnp.concatenate([tag, inputs], axis=1))
        out = state[:, 0]
        return out[..., 0] if squeeze else out
