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
from ..utils.aot_cache import aot_jit

#: multiplicative generators used by arkworks v0.3 Fr configs (plus the
#: standard BabyBear generator, used by the fast NTT test suite — a 31-bit
#: field keeps interpret-mode kernel runs cheap)
GENERATORS = {
    "bn254_fr": 5,
    "bls12_381_fr": 7,
    "bls12_377_fr": 22,
    "babybear": 31,
    # BW6-761's scalar field = BLS12-377's base field (two-adicity 46).
    # 5 is the smallest quadratic non-residue mod q (self-derived — the ark
    # crate constant is unavailable here), which guarantees
    # g^((q-1)/2^46) has order exactly 2^46 and g^n != 1 for every domain
    # size n <= 2^45 (coset Z(g w^j) never vanishes).
    "bls12_377_fq": 5,
}


def _use_kernel() -> bool:
    """Route stage bodies through the fused Pallas butterfly on TPU.

    Decided at trace time (tests pin the CPU platform, production the TPU
    backend) — same convention as curves.jacobian._pallas_ec."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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


@functools.partial(aot_jit, static_argnums=(0, 2))
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

    kernel = _use_kernel()

    def stage(xc, s):
        u, t = xc[:, :half], xc[:, half:]
        e = iota & ~(jnp.left_shift(jnp.int32(1), s) - 1)
        tw = table[:, e].reshape((spec.n_limbs, half) + (1,) * len(batch))
        if kernel:
            from . import ntt_kernel

            lo, hi = ntt_kernel.butterfly(
                spec, u, t, jnp.broadcast_to(tw, u.shape)
            )
        else:
            lo = limb.add(spec, u, t)
            hi = limb.mont_mul(spec, limb.sub(spec, u, t), tw)
        out = jnp.stack([lo, hi], axis=2).reshape(
            (spec.n_limbs, n) + batch
        )
        return out, None

    x, _ = lax.scan(stage, x, jnp.arange(log_n, dtype=jnp.int32))
    x = jnp.take(x, jnp.asarray(rev), axis=1)
    if inverse:
        if kernel:
            from . import ntt_kernel

            x = ntt_kernel.mont_scale(spec, x, jnp.asarray(n_inv))
        else:
            scale = jnp.asarray(n_inv).reshape(
                (spec.n_limbs,) + (1,) * (x.ndim - 1)
            )
            x = limb.mont_mul(spec, x, scale)
    return x


# ---------------------------------------------------------------------------
# four-step (Bailey) decomposition: every butterfly stage runs inside ONE
# fused Pallas kernel launch
# ---------------------------------------------------------------------------
#
# The per-stage path above pays ~2 ms of XLA glue (interleave + twiddle
# gather) per stage — 40+ ms of pure overhead at 2^18. Here the transform is
# decomposed as N = M x N2 (M <= ntt_kernel._M_MAX): an M-point NTT over
# columns (all log2(M) DIF stages fused in VMEM, lanes untouched), an
# elementwise twiddle correction, a transpose, and a recursive transform of
# the rows. Each level's kernel emits its axis in bit-reversed order; the
# composed mixed-radix digit reversal is applied as ONE host-precomputed
# gather at the top, and the 1/N scale (inverse) as one fused mont_mul.
#
# Replaces the same ark-poly Radix2EvaluationDomain hot path; the
# decomposition itself mirrors the classic Bailey four-step FFT, laid out so
# butterflies always pair rows on the TPU sublane axis.

#: below this size the per-stage path wins (the top-level split would leave
#: fewer than 128 lanes for the column kernel: M_MAX * 128 = 2^13)
_FOURSTEP_MIN = 1 << 13


def _bitrev_idx(m: int) -> np.ndarray:
    log = m.bit_length() - 1
    idx = np.arange(m, dtype=np.int64)
    r = np.zeros(m, dtype=np.int64)
    for _ in range(log):
        r = (r << 1) | (idx & 1)
        idx >>= 1
    return r


@functools.lru_cache(maxsize=None)
def _root_powers(spec: FieldSpec, log_n: int, inverse: bool) -> np.ndarray:
    """R[:, j] = w^j (Montgomery limbs) for all j < N; every twiddle table
    in the four-step plan is a fancy-index of this one array.

    The bigint power chain + pack is minutes of host time at 2^21+, so the
    packed array is cached on disk per (field, size, direction)."""
    import pathlib
    import tempfile

    cache_dir = pathlib.Path(tempfile.gettempdir()) / "openzl_ntt_tables"
    tag = f"R_{spec.name}_{log_n}_{'inv' if inverse else 'fwd'}.npy"
    path = cache_dir / tag
    if path.exists():
        try:
            return np.load(path)
        except Exception:
            pass  # corrupt/partial file: rebuild below
    n = 1 << log_n
    p = spec.modulus
    w = group_gen(spec, log_n)
    if inverse:
        w = pow(w, -1, p)
    pows = np.empty(n, dtype=object)
    acc = 1
    for j in range(n):
        pows[j] = acc
        acc = acc * w % p
    R = limb.pack_mont(spec, pows)
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        tmp = tempfile.NamedTemporaryFile(
            dir=cache_dir, suffix=".npy", delete=False
        )
        np.save(tmp, R)
        tmp.close()
        pathlib.Path(tmp.name).rename(path)  # atomic vs concurrent writers
    except Exception:
        pass  # cache is best-effort
    return R


def _stage_twiddles(spec, R, n, m):
    """(n_limbs, log2(m), m) table for the fused DIF kernel.

    Stage s has butterfly half-width h = m >> (s+1), twiddle base
    w_m^{2^s} = w_N^{(N/m) 2^s}. Layout per stage row:
      * h >= _ROLL_H (reshape stages): first h entries hold w^j, rest zero
      * h <  _ROLL_H (roll stages): full-width — entry i holds
        w^(i & (h-1)), the in-block index of row i's hi butterfly
    """
    from .ntt_kernel import _ROLL_H

    log_m = m.bit_length() - 1
    out = np.zeros((spec.n_limbs, log_m, m), dtype=np.uint32)
    for s in range(log_m):
        h = m >> (s + 1)
        base = (n // m) * (1 << s)
        if h >= _ROLL_H:
            j = np.arange(h, dtype=np.int64)
            out[:, s, :h] = R[:, base * j % n]
        else:
            i = np.arange(m, dtype=np.int64)
            out[:, s, :] = R[:, base * (i & (h - 1)) % n]
    return out


def _build_node(spec, R, n, nt, m_max, c):
    """Nested (stage_tw, br, level_tw, inner) tables for a length-`nt`
    transform (root w_N^{N/nt}) carrying `c` trailing lanes per element.

    `br` un-reverses the column kernel's bit-reversed rows — applied as a
    coarse row gather (rows are n2*c lanes wide) right after each kernel,
    so every level hands natural-order rows downstream and no final
    permutation exists at all. level_tw rides INTO the kernel as its fused
    post-multiply (rows pre-permuted to the kernel's bit-reversed output
    order: level_tw[r, j] = w_nt^{bitrev(r) * j}) and is pre-tiled across
    the carried axis — the twiddle correction costs no extra HBM pass."""
    if nt <= m_max:
        return (
            _stage_twiddles(spec, R, n, nt),
            _bitrev_idx(nt).astype(np.int32),
            None,
            None,
        )
    n1 = m_max
    if nt // n1 < 16:
        # avoid a tiny tail transform (e.g. 2^20 = 64*64*64*4): a base
        # kernel with M < 8 sublanes pads every op to (8, 128) tiles and
        # its grid is huge; balance the last split instead (64*64*16*16)
        n1 = max(2, nt // 16)
    n2 = nt // n1
    stage_tw = _stage_twiddles(spec, R, n, n1)
    br = _bitrev_idx(n1)
    e = (
        (n // nt)
        * br[:, None]
        * np.arange(n2, dtype=np.int64)[None, :]
        % n
    )
    tiled = np.broadcast_to(
        R[:, e][:, :, :, None], (spec.n_limbs, n1, n2, c)
    ).reshape(spec.n_limbs, n1, n2 * c)
    return (
        stage_tw,
        br.astype(np.int32),
        tiled,
        _build_node(spec, R, n, n2, m_max, n1 * c),
    )


@functools.lru_cache(maxsize=None)
def _fourstep_tables(
    spec: FieldSpec, log_n: int, inverse: bool, m_max: int, batch: int = 1
):
    """Device-resident table pytree; built host-side once per (field, size,
    direction, batch) and device_put outside any trace."""
    n = 1 << log_n
    R = _root_powers(spec, log_n, inverse)
    nodes = _build_node(spec, R, n, n, m_max, batch)
    n_inv = (
        limb.pack_mont(spec, pow(n, -1, spec.modulus)) if inverse else None
    )
    return jax.device_put((nodes, n_inv))


def _apply_node(spec, x, node, interpret):
    """x: (n_limbs, nt, c) — transform along axis 1, c carried lanes per
    element. Returns the same shape in digit-permuted order along a
    flattened (nt*c) ... the caller tracks (nt, c) factorization; every
    intermediate keeps its minor dim >= the carried lane count (no
    singleton axes, so XLA transposes stay single-relayout)."""
    from . import ntt_kernel

    stage_tw, br, level_tw, inner = node
    n, nt, c = x.shape
    if inner is None:
        y = ntt_kernel.small_ntt(spec, x, stage_tw, None, interpret)
        return jnp.take(y, br, axis=1)
    n1 = 1 << stage_tw.shape[1]  # stage_tw is (n_limbs, log2(n1), n1)
    n2 = nt // n1
    y = ntt_kernel.small_ntt(
        spec, x.reshape(n, n1, n2 * c), stage_tw, level_tw, interpret
    )
    z = jnp.take(y, br, axis=1)  # coarse row gather: natural-order k1
    if c == 1:
        w = z.reshape(n, n1, n2).transpose(0, 2, 1)
    else:
        w = (
            z.reshape(n, n1, n2, c)
            .transpose(0, 2, 1, 3)
            .reshape(n, n2, n1 * c)
        )
    v = _apply_node(spec, w, inner, interpret)
    return v.reshape(n, nt, c)


@functools.partial(aot_jit, static_argnums=(0, 3))
def _fourstep_core(spec: FieldSpec, x, tables, interpret):
    nodes, n_inv = tables
    from . import ntt_kernel

    n = spec.n_limbs
    nt = x.shape[1]
    batch = x.shape[2:]
    b = int(np.prod(batch)) if batch else 1
    out = _apply_node(spec, x.reshape(n, nt, b), nodes, interpret)
    if n_inv is not None:
        out = ntt_kernel.mont_scale(spec, out, n_inv, interpret)
    return out.reshape((n, nt) + batch)


def fourstep_transform(
    spec: FieldSpec,
    x: jnp.ndarray,
    inverse: bool,
    m_max: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel NTT/iNTT; exposed with `m_max`/`interpret` so tests can
    run the full plan machinery in interpret mode at toy sizes."""
    from . import ntt_kernel

    m_max = m_max or ntt_kernel._M_MAX
    log_n = x.shape[1].bit_length() - 1
    b = int(np.prod(x.shape[2:])) if x.ndim > 2 else 1
    tables = _fourstep_tables(spec, log_n, inverse, m_max, b)
    return _fourstep_core(spec, x, tables, interpret)


def _transform(spec: FieldSpec, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[1]
    assert n & (n - 1) == 0, "domain size must be a power of two"
    if (
        n >= _FOURSTEP_MIN
        and _use_kernel()
        and not isinstance(x, jax.core.Tracer)
    ):
        return fourstep_transform(spec, x, inverse)
    return _ntt_core(spec, x, inverse)


def ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form coefficients (n_limbs, N, *batch) -> evaluations."""
    return _transform(spec, coeffs, False)


def intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    return _transform(spec, evals, True)


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


def _coset_mul(spec: FieldSpec, x: jnp.ndarray, scales) -> jnp.ndarray:
    sc = jnp.asarray(scales).reshape(
        (spec.n_limbs, x.shape[1]) + (1,) * (x.ndim - 2)
    )
    if _use_kernel():
        from . import ntt_kernel

        return ntt_kernel.mont_mul(spec, x, jnp.broadcast_to(sc, x.shape))
    return limb.mont_mul(spec, x, sc)


def coset_ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate on the coset g*H: scale coeff i by g^i, then NTT."""
    n = coeffs.shape[1]
    return ntt(spec, _coset_mul(spec, coeffs, _coset_scales(spec, n, False)))


def coset_intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    n = evals.shape[1]
    return _coset_mul(spec, intt(spec, evals), _coset_scales(spec, n, True))
