"""Multi-scalar multiplication: Pippenger over sorted, segment-reduced windows.

TPU-native replacement for arkworks' Pippenger MSM (the Groth16 prove hot
path, SURVEY.md sections 2.8 and 3.2). The classic bucket method relies on
data-dependent scatter-accumulate, which SIMD machines hate; here each window
is computed as:

  1. digit extraction (c-bit windows of the canonical scalars)
  2. `argsort` by digit (XLA sort — TPU-friendly)
  3. segmented inclusive scan with the EC-add monoid (Hillis-Steele:
     log2(N) full-width combines, keeping the traced graph small)
  4. one masked scatter of segment tails into the 2^c bucket array
  5. bucket-weighted sum  sum_b b * B_b  via a suffix scan + tree reduce
  6. Horner window combine (c doublings per window)

Total EC-add work is ~2x ideal Pippenger but every add runs at full batch
width on the VPU. Multi-chip scaling shards points per chip and reduces the
per-chip partial MSMs (see openzl_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..curves import jacobian as jac
from ..curves.jacobian import JPoint
from ..curves.spec import CurveSpec
from ..fields.spec import LIMB_BITS
from .scan_utils import inclusive_scan, segmented_scan


def _default_window_bits(n: int) -> int:
    """Pippenger heuristic: c ~ log2(n) - 3, clamped to [4, 16]."""
    c = max(n.bit_length() - 4, 4)
    return min(c, 16)


def _digits(scalars: jnp.ndarray, window: int, c: int) -> jnp.ndarray:
    """Extract window `window`'s c-bit digit from canonical limb scalars."""
    lo_bit = window * c
    limb_idx = lo_bit // LIMB_BITS
    shift = lo_bit % LIMB_BITS
    d = scalars[limb_idx] >> jnp.uint32(shift)
    rem = LIMB_BITS - shift
    if rem < c and limb_idx + 1 < scalars.shape[0]:
        d = d | (scalars[limb_idx + 1] << jnp.uint32(rem))
    return (d & jnp.uint32((1 << c) - 1)).astype(jnp.int32)


def _segmented_bucket_sums(
    curve: CurveSpec, pts: JPoint, digits: jnp.ndarray, c: int
) -> JPoint:
    """Per-bucket EC sums for one window; returns buckets (batch = 2^c).

    Bucket b holds the sum of points whose digit == b (bucket 0 unused).
    """
    F = jac.field_ops(curve)
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = JPoint(F.take(pts.x, order), F.take(pts.y, order), F.take(pts.z, order))

    # segment starts: first element or digit change
    prev = jnp.concatenate([jnp.full((1,), -1, sd.dtype), sd[:-1]])
    starts = sd != prev

    def combine_pts(a, b):
        return tuple(jac.add(curve, JPoint(*a), JPoint(*b)))

    def pad(k):
        return tuple(jac.identity(curve, (k,)))

    scanned = segmented_scan(combine_pts, tuple(sp), starts, pad)
    acc = JPoint(*scanned)

    # segment tails hold the bucket totals
    nxt = jnp.concatenate([sd[1:], jnp.full((1,), -1, sd.dtype)])
    tails = sd != nxt
    # masked scatter: dump non-tails (and digit 0) into slot 2^c
    slot = jnp.where(tails & (sd > 0), sd, 1 << c)
    buckets = jac.identity(curve, ((1 << c) + 1,))
    buckets = JPoint(
        F.scatter_set(buckets.x, slot, acc.x),
        F.scatter_set(buckets.y, slot, acc.y),
        F.scatter_set(buckets.z, slot, acc.z),
    )
    return JPoint(
        F.slice_batch(buckets.x, 0, 1 << c),
        F.slice_batch(buckets.y, 0, 1 << c),
        F.slice_batch(buckets.z, 0, 1 << c),
    )


def _weighted_bucket_total(curve: CurveSpec, buckets: JPoint, c: int) -> JPoint:
    """sum_b b * B_b via suffix scan: S = sum_j running_j, running_j = sum_{b>=j} B_b.

    Both scans run at the full 2^c width (power of two, so the chunked
    work-efficient scan applies): bucket 0 is always the identity point
    (digit-0 tails are dumped past the bucket array in
    `_segmented_bucket_sums`), so including it in the suffix contributes
    exactly weight-0 — no trimming required.
    """
    F = jac.field_ops(curve)
    width = 1 << c

    def combine(a, b):
        return tuple(jac.add(curve, JPoint(*a), JPoint(*b)))

    def pad(k):
        return tuple(jac.identity(curve, (k,)))

    rev = JPoint(F.reverse(buckets.x), F.reverse(buckets.y), F.reverse(buckets.z))
    # running[j] = sum of buckets[2^c-1-j ..]. Summing the FIRST 2^c - 1
    # running values weights B_b by exactly b (the final running value — the
    # grand total including bucket 0 — would shift every weight up by one),
    # so the answer is the inclusive prefix at index 2^c - 2.
    running = inclusive_scan(combine, tuple(rev), pad)
    summed = inclusive_scan(combine, running, pad)
    total = JPoint(*summed)
    return JPoint(*(F.take(v, width - 2) for v in total))


def msm(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    points: JPoint,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
) -> JPoint:
    """sum_i scalars[i] * points[i].

    scalars: (n_limbs_scalar, N) canonical (non-Montgomery) limbs.
    points:  JPoint with batch (N,). Returns a scalar-batch JPoint.
    n_bits: static bound on scalar bit-length (default: full field width);
    callers that know their scalars are short (e.g. tests, fixed-base tables)
    can cut the window count proportionally.

    Inputs are padded to the next power of two (min 8) with zero scalars so
    distinct problem sizes share compiled kernels.
    """
    n = scalars.shape[1]
    padded = max(8, 1 << (n - 1).bit_length())
    if padded != n:
        from ..curves.jacobian import field_ops

        F = field_ops(curve)
        scalars = jnp.concatenate(
            [
                jnp.asarray(scalars),
                jnp.zeros(
                    (scalars.shape[0], padded - n), dtype=jnp.uint32
                ),
            ],
            axis=1,
        )
        pad_pts = jac.identity(curve, (padded - n,))
        points = JPoint(
            F.concat([points.x, pad_pts.x]),
            F.concat([points.y, pad_pts.y]),
            F.concat([points.z, pad_pts.z]),
        )
    return _msm_jit(curve, scalars, points, window_bits, n_bits)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_jit(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    points: JPoint,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
) -> JPoint:
    n = scalars.shape[1]
    c = window_bits or _default_window_bits(n)
    n_windows = -(-(n_bits or curve.scalar.bits) // c)

    # All window digits up front; the per-window bucket pipeline then runs
    # under lax.scan so it compiles once regardless of window count.
    digits_all = jnp.stack([_digits(scalars, w, c) for w in range(n_windows)])

    def window_body(_, d):
        buckets = _segmented_bucket_sums(curve, points, d, c)
        total = _weighted_bucket_total(curve, buckets, c)
        return None, tuple(total)

    _, sums = lax.scan(window_body, None, digits_all)
    sums = JPoint(*sums)  # leading axis = window index

    # Horner from the most significant window: acc = 2^c * acc + S_w
    # (doublings under fori_loop: one `double` instance in the graph)
    def horner_body(acc, sum_w):
        acc = lax.fori_loop(
            0, c, lambda _, a: tuple(jac.double(curve, JPoint(*a))), acc
        )
        acc = jac.add(curve, JPoint(*acc), JPoint(*sum_w))
        return tuple(acc), None

    top = tuple(v[-1] for v in sums)
    rest = tuple(v[: n_windows - 1][::-1] for v in sums)
    acc, _ = lax.scan(horner_body, top, rest)
    return JPoint(*acc)
