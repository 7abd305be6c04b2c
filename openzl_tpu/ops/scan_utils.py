"""Work-efficient scans with CONSTANT-size traced graphs.

`lax.associative_scan` emits ~2N combiner instances into the HLO; a naive
Hillis-Steele unroll emits ceil(log2(N)). With an EC-add combiner (~800 HLO
ops after scan-compressed Montgomery muls) even log2(2^16) = 16 instances
overwhelmed the TPU AOT compile helper (observed SIGKILL at MSM 2^16).

Two scan strategies, both with O(1) combiner instances in the graph:

* `_hillis_steele` — the round-1 fallback: the Hillis-Steele step under
  `lax.fori_loop` with a DYNAMIC shift (jnp.roll + identity mask). ONE
  combiner instance, but N*log2(N) combine work.

* `inclusive_scan` (default) — chunked three-phase scan: split the batch
  axis into L chunks of R elements; (1) serially fold the R columns under
  `lax.fori_loop` (one combiner instance at width L, accumulating the
  intra-chunk inclusive prefixes), (2) Hillis-Steele the L chunk totals
  (small width), (3) combine the exclusive chunk offsets back onto the
  intra-chunk prefixes (one full-width instance). Total combine work is
  2N + (N/R)*log2(N/R) — ~7x less than Hillis-Steele at N = 2^16 — with
  exactly THREE combiner instances regardless of N. This is the classic
  GPU/TPU chunked scan (scan-then-propagate); every combine still runs at
  full vector width on the VPU.

The chunked path requires the identity-element convention to be exact:
`pad(k)` must return TRUE monoid identities (combine(pad, x) == x ==
combine(x, pad)); the EC-add identity point and the (flag=0, value=id)
segmented lift both satisfy it.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from jax import lax

#: Serial chunk length for the three-phase scan. R=32 keeps the serial
#: phase short while shrinking the Hillis-Steele phase to width N/32.
_CHUNK = 32
#: Minimum chunk-lane width worth vectorizing; below this the plain
#: Hillis-Steele is both simpler and no slower.
_MIN_LANES = 256


def _hillis_steele(combine: Callable, xs: Tuple, pad: Callable[[int], Tuple]):
    """Hillis-Steele inclusive scan: one combiner instance, N log N work."""
    n = xs[0].shape[-1]
    if n == 1:
        return xs
    log_n = (n - 1).bit_length()
    idp = pad(n)
    iota = jnp.arange(n)

    def body(i, xs):
        d = jnp.left_shift(1, i)
        keep = iota >= d  # positions with a partner d to the left
        shifted = tuple(
            jnp.where(
                keep.reshape((1,) * (x.ndim - 1) + (n,)),
                jnp.roll(x, d, axis=-1),
                ident,
            )
            for x, ident in zip(xs, idp)
        )
        return combine(shifted, xs)

    return lax.fori_loop(0, log_n, body, tuple(xs))


def inclusive_scan(
    combine: Callable,
    xs: Tuple,
    pad: Callable[[int], Tuple],
):
    """Inclusive scan over the LAST axis of each leaf in `xs`.

    combine(a, b): b is the "later" operand; must be associative.
    pad(k): TRUE identity-element leaves of batch length k.
    """
    n = xs[0].shape[-1]
    if n == 1:
        return xs
    r = _CHUNK
    while r > 1 and (n % r or n // r < _MIN_LANES):
        r //= 2
    if r < 4:
        return _hillis_steele(combine, xs, pad)
    l = n // r

    # ---- phase 1: serial intra-chunk prefixes ---------------------------
    # leaf (..., n) -> (..., L, R); column r holds element l*R + r of the
    # scan axis, so a fori_loop over the R columns is a width-L serial fold.
    cs = tuple(x.reshape(x.shape[:-1] + (l, r)) for x in xs)
    acc0 = pad(l)

    def col(b, i):
        return tuple(
            lax.squeeze(lax.dynamic_slice_in_dim(x, i, 1, axis=x.ndim - 1),
                        (x.ndim - 1,))
            for x in b
        )

    def body(i, carry):
        acc, buf = carry
        acc = combine(acc, col(cs, i))
        buf = tuple(
            lax.dynamic_update_slice_in_dim(
                b, a[..., None], i, axis=b.ndim - 1
            )
            for b, a in zip(buf, acc)
        )
        return acc, buf

    totals, prefixes = lax.fori_loop(0, r, body, (acc0, cs))

    # ---- phase 2: exclusive chunk offsets (small width L) ---------------
    incl = _hillis_steele(combine, totals, pad)
    one = pad(1)
    excl = tuple(
        jnp.concatenate([i1, t[..., : l - 1]], axis=-1)
        for i1, t in zip(one, incl)
    )

    # ---- phase 3: offsets onto intra-chunk prefixes (full width) --------
    off = tuple(
        jnp.broadcast_to(e[..., None], p.shape) for e, p in zip(excl, prefixes)
    )
    out = combine(off, prefixes)
    return tuple(o.reshape(x.shape) for o, x in zip(out, xs))


def segmented_scan(
    combine_values: Callable,
    values: Tuple,
    starts: jnp.ndarray,
    pad: Callable[[int], Tuple],
):
    """Segmented inclusive scan: resets at each True in `starts`.

    Uses the standard segmented-monoid lift: carry (value, reset-flag); the
    combine keeps `b` untouched once its segment start has been passed. The
    lift's identity is (value-identity, flag=False) — flag=False makes
    combine(id, x) == x == combine(x, id) hold exactly, which the chunked
    scan requires.
    Returns scanned values (per-position segment prefix aggregation).
    """

    def seg_combine(a, b):
        va, fa = a[:-1], a[-1]
        vb, fb = b[:-1], b[-1]
        merged = combine_values(va, vb)
        keep_b = fb  # b starts a (or is past its) segment boundary
        out = tuple(
            jnp.where(_expand(keep_b, m.ndim - keep_b.ndim), bb, m)
            for m, bb in zip(merged, vb)
        )
        return (*out, fa | fb)

    def seg_pad(k):
        return (*pad(k), jnp.zeros(starts.shape[:-1] + (k,), dtype=bool))

    out = inclusive_scan(seg_combine, (*values, starts), seg_pad)
    return out[:-1]


def _expand(mask: jnp.ndarray, extra: int) -> jnp.ndarray:
    return mask.reshape((1,) * extra + mask.shape)
