"""Radix-2 NTT/iNTT over prime scalar fields, bit-exact with ark-poly.

TPU-native replacement for ark-poly's `Radix2EvaluationDomain` (the FFT engine
behind Groth16's H-polynomial computation; reference call stack SURVEY.md
section 3.2, plugins/arkworks/Cargo.toml ark-poly dependency).

Conventions matched to arkworks v0.3:
  * domain of size N = 2^k exists iff k <= two-adicity of (p-1)
  * group_gen = two_adic_root ^ (2^(TWO_ADICITY - k))
  * fft(coeffs) = evaluations at [w^0, w^1, ..., w^(N-1)] in natural order
  * ifft scales by N^{-1}
  * coset fft evaluates on g*H (Groth16 uses the coset of the multiplicative
    generator to divide by the vanishing polynomial)

Design: iterative decimation-in-time butterflies over the limb-decomposed
Montgomery representation — each stage is one full-width vectorized
add/sub/mul over the whole array (the VPU-friendly axis), with the
bit-reversal permutation as a single gather. All stages trace into one jitted
graph; twiddles are precomputed host-side per (field, size) and cached.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import limb
from ..fields.spec import FieldSpec

#: multiplicative generators used by arkworks v0.3 Fr configs
GENERATORS = {
    "bn254_fr": 5,
    "bls12_381_fr": 7,
}


def two_adicity(spec: FieldSpec) -> int:
    n = spec.modulus - 1
    s = 0
    while n % 2 == 0:
        n //= 2
        s += 1
    return s


def group_gen(spec: FieldSpec, log_n: int) -> int:
    """Primitive 2^log_n-th root of unity, arkworks derivation."""
    adicity = two_adicity(spec)
    assert log_n <= adicity, f"domain 2^{log_n} too large for {spec.name}"
    g = GENERATORS[spec.name]
    root = pow(g, (spec.modulus - 1) >> adicity, spec.modulus)
    return pow(root, 1 << (adicity - log_n), spec.modulus)


@functools.lru_cache(maxsize=None)
def _plan(spec: FieldSpec, log_n: int, inverse: bool):
    """(bit_rev_index, root-power table W[j] = w^j for j < n/2, n_inv).

    Host-side, cached per (field, size, direction)."""
    n = 1 << log_n
    p = spec.modulus
    w = group_gen(spec, log_n)
    if inverse:
        w = pow(w, -1, p)
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(log_n):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    pows = [1] * max(1, n // 2)
    for j in range(1, n // 2):
        pows[j] = pows[j - 1] * w % p
    table = limb.pack_mont(spec, np.array(pows, dtype=object))
    n_inv = limb.pack_mont(spec, pow(n, -1, p))
    return rev, table, n_inv


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_core(spec: FieldSpec, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Constant-geometry (Pease) decimation-in-frequency butterflies.

    Every stage has IDENTICAL data movement — split halves, butterfly,
    interleave — so all log2(N) stages run under one `lax.scan` body and the
    compiled graph is O(one stage) instead of O(N-log-N unrolled): at
    N = 2^18 this cut XLA compile time from ~25 minutes to seconds while
    keeping the same butterfly count.

    Stage s pairs (x[k], x[k+N/2]), writes (u+t) to slot 2k and
    (u-t) * w^e(k,s) to slot 2k+1, with the closed-form twiddle exponent
    e(k, s) = k & ~(2^s - 1) (gathered from the root-power table). After
    all stages the array is in bit-reversed order; one gather restores
    natural order. Verified bit-exact against the naive DFT
    (tests/test_ntt.py).
    """
    n = x.shape[1]
    if n == 1:
        return x
    log_n = n.bit_length() - 1
    rev, table, n_inv = _plan(spec, log_n, inverse)
    batch = x.shape[2:]
    half = n // 2
    table = jnp.asarray(table)
    iota = jnp.arange(half, dtype=jnp.int32)

    def stage(xc, s):
        u, t = xc[:, :half], xc[:, half:]
        e = iota & ~(jnp.left_shift(jnp.int32(1), s) - 1)
        tw = table[:, e].reshape((spec.n_limbs, half) + (1,) * len(batch))
        lo = limb.add(spec, u, t)
        hi = limb.mont_mul(spec, limb.sub(spec, u, t), tw)
        out = jnp.stack([lo, hi], axis=2).reshape(
            (spec.n_limbs, n) + batch
        )
        return out, None

    x, _ = lax.scan(stage, x, jnp.arange(log_n, dtype=jnp.int32))
    x = jnp.take(x, jnp.asarray(rev), axis=1)
    if inverse:
        scale = jnp.asarray(n_inv).reshape(
            (spec.n_limbs,) + (1,) * (x.ndim - 1)
        )
        x = limb.mont_mul(spec, x, scale)
    return x


def ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form coefficients (n_limbs, N, *batch) -> evaluations."""
    n = coeffs.shape[1]
    assert n & (n - 1) == 0, "domain size must be a power of two"
    return _ntt_core(spec, coeffs, False)


def intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    n = evals.shape[1]
    assert n & (n - 1) == 0
    return _ntt_core(spec, evals, True)


# ---------------------------------------------------------------------------
# coset transforms (Groth16's H-poly path divides on the coset g*H)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _coset_scales(spec: FieldSpec, n: int, inverse: bool):
    p = spec.modulus
    g = GENERATORS[spec.name]
    if inverse:
        g = pow(g, -1, p)
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * g % p
    return limb.pack_mont(spec, np.array(pows, dtype=object))


def coset_ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate on the coset g*H: scale coeff i by g^i, then NTT."""
    n = coeffs.shape[1]
    scales = jnp.asarray(_coset_scales(spec, n, False)).reshape(
        (spec.n_limbs, n) + (1,) * (coeffs.ndim - 2)
    )
    return ntt(spec, limb.mont_mul(spec, coeffs, scales))


def coset_intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    n = evals.shape[1]
    out = intt(spec, evals)
    scales = jnp.asarray(_coset_scales(spec, n, True)).reshape(
        (spec.n_limbs, n) + (1,) * (evals.ndim - 2)
    )
    return limb.mont_mul(spec, out, scales)
