"""Log-depth scans with log-size traced graphs.

`lax.associative_scan` emits ~2N combiner instances into the HLO; with an
EC-add combiner (~300 field ops) that explodes compile time. These
Hillis-Steele scans emit exactly ceil(log2(N)) full-width combiner instances
— bigger FLOP count (N log N vs 2N) but every combine runs at full vector
width on the VPU and the graph stays small. The right trade on TPU.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp


def inclusive_scan(
    combine: Callable,
    xs: Tuple,
    pad: Callable[[int], Tuple],
):
    """Inclusive scan over the LAST axis of each leaf in `xs`.

    combine(a, b): b is the "later" operand; must be associative.
    pad(k): identity-element leaves of batch length k (prepended).
    """
    n = xs[0].shape[-1]
    d = 1
    while d < n:
        idp = pad(d)
        shifted = tuple(
            jnp.concatenate([i, x[..., : n - d]], axis=-1)
            for i, x in zip(idp, xs)
        )
        xs = combine(shifted, xs)
        d *= 2
    return xs


def segmented_scan(
    combine_values: Callable,
    values: Tuple,
    starts: jnp.ndarray,
    pad: Callable[[int], Tuple],
):
    """Segmented inclusive scan: resets at each True in `starts`.

    Uses the standard segmented-monoid lift: carry (value, done-flag); the
    combine keeps `b` untouched once its segment start has been passed.
    Returns scanned values (per-position segment prefix aggregation).
    """
    n = starts.shape[-1]

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
        return (*pad(k), jnp.ones(starts.shape[:-1] + (k,), dtype=bool))

    out = inclusive_scan(seg_combine, (*values, starts), seg_pad)
    return out[:-1]


def _expand(mask: jnp.ndarray, extra: int) -> jnp.ndarray:
    return mask.reshape((1,) * extra + mask.shape)
