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
    """(bit_rev_index, per-stage twiddle arrays, n_inv) — host-side, cached."""
    n = 1 << log_n
    p = spec.modulus
    w = group_gen(spec, log_n)
    if inverse:
        w = pow(w, -1, p)
    # bit reversal permutation
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(log_n):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    # stage twiddles: stage s has half-block m = 2^s, twiddles w_m^j,
    # w_m = w^(n / 2m)
    stages = []
    for s in range(log_n):
        m = 1 << s
        wm = pow(w, n // (2 * m), p)
        tw = [1] * m
        for j in range(1, m):
            tw[j] = tw[j - 1] * wm % p
        stages.append(limb.pack_mont(spec, np.array(tw, dtype=object)))
    n_inv = limb.pack_mont(spec, pow(n, -1, p))
    return rev, tuple(stages), n_inv


def _butterflies(spec: FieldSpec, x: jnp.ndarray, stages) -> jnp.ndarray:
    """x: (n_limbs, N, *batch) in bit-reversed order -> natural-order NTT."""
    n = x.shape[1]
    batch = x.shape[2:]
    for s, tw in enumerate(stages):
        m = 1 << s
        blocks = n // (2 * m)
        v = x.reshape((spec.n_limbs, blocks, 2, m) + batch)
        u, t = v[:, :, 0], v[:, :, 1]
        twb = jnp.asarray(tw).reshape((spec.n_limbs, 1, m) + (1,) * len(batch))
        t = limb.mont_mul(spec, t, twb)
        lo = limb.add(spec, u, t)
        hi = limb.sub(spec, u, t)
        x = jnp.stack([lo, hi], axis=2).reshape((spec.n_limbs, n) + batch)
    return x


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_core(spec: FieldSpec, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[1]
    log_n = n.bit_length() - 1
    rev, stages, n_inv = _plan(spec, log_n, inverse)
    x = jnp.take(x, jnp.asarray(rev), axis=1)
    x = _butterflies(spec, x, stages)
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
