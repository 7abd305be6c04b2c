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


def _default_window_bits(n: int, total_bits: int = 255) -> int:
    """Pick c minimizing modeled EC-add work over all windows.

    Per window: ~0.8n mixed adds (segment-total pipeline) + ~5*2^c full
    adds (bucket-width lifted combine + the two weighted-total scans).
    """
    best, best_cost = 4, None
    for c in range(4, 17):
        windows = -(-total_bits // c)
        cost = windows * (0.8 * n + 5.0 * (1 << c))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


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


def _bucket_totals_fast(
    curve: CurveSpec, pts: JPoint, digits: jnp.ndarray, c: int
) -> JPoint:
    """Segment-TOTAL bucket accumulation: ~n mixed adds per window.

    Improves on `_segmented_bucket_sums` (a full segmented prefix scan,
    ~2n full adds) by exploiting two facts: (1) only segment tails are
    needed, and there are at most 2^c of them, so the cross-chunk offset
    fix-up runs at bucket width instead of batch width; (2) the points are
    pre-normalized (Z in {0,1}), so the serial intra-chunk fold uses the
    cheaper mixed add.

    Pipeline: argsort by digit; serial fold over R columns of the (L, R)
    chunk grid under ONE fori_loop, scattering each tail's chunk-local
    prefix (plus its chunk index and segment-start flag) into the bucket
    arrays as it appears; lifted segmented scan over the L chunk totals;
    one bucket-width gather + lifted combine applies cross-chunk offsets.
    Requires pts normalized (`jacobian.normalize`).
    """
    F = jac.field_ops(curve)
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = JPoint(F.take(pts.x, order), F.take(pts.y, order), F.take(pts.z, order))

    prev = jnp.concatenate([jnp.full((1,), -1, sd.dtype), sd[:-1]])
    starts = sd != prev
    nxt = jnp.concatenate([sd[1:], jnp.full((1,), -1, sd.dtype)])
    tails = sd != nxt

    r = 32
    while r > 1 and (n % r or n // r < 8):
        r //= 2
    if r < 4:
        return _segmented_bucket_sums(curve, pts, digits, c)
    l = n // r
    dump = 1 << c
    width = dump + 1

    # element l*r + j <-> (chunk l, column j)
    def rs(v):
        return v.reshape(v.shape[:-1] + (l, r))

    cps = JPoint(rs(sp.x), rs(sp.y), rs(sp.z))
    sd2, st2, tl2 = sd.reshape(l, r), starts.reshape(l, r), tails.reshape(l, r)
    chunk_ids = jnp.arange(l, dtype=jnp.int32)

    acc0 = tuple(jac.identity(curve, (l,)))
    bv0 = tuple(jac.identity(curve, (width,)))
    carry0 = (
        acc0,
        jnp.zeros((l,), bool),  # segment started within this chunk?
        bv0,
        jnp.ones((width,), bool),  # tail-local value complete?
        jnp.zeros((width,), jnp.int32),  # tail's chunk index
    )

    def col(v, j):
        return lax.squeeze(
            lax.dynamic_slice_in_dim(v, j, 1, axis=v.ndim - 1), (v.ndim - 1,)
        )

    def body(j, carry):
        acc, aflag, bv, bflag, bci = carry
        q = JPoint(col(cps.x, j), col(cps.y, j), col(cps.z, j))
        s = lax.dynamic_index_in_dim(st2, j, axis=1, keepdims=False)
        t = lax.dynamic_index_in_dim(tl2, j, axis=1, keepdims=False)
        d = lax.dynamic_index_in_dim(sd2, j, axis=1, keepdims=False)
        summed = jac.madd(curve, JPoint(*acc), q)
        acc_p = jac.select(s, q, summed, F)
        aflag = aflag | s
        slot = jnp.where(t & (d > 0), d, dump)
        bv = JPoint(
            F.scatter_set(bv[0], slot, acc_p.x),
            F.scatter_set(bv[1], slot, acc_p.y),
            F.scatter_set(bv[2], slot, acc_p.z),
        )
        bflag = bflag.at[slot].set(aflag)
        bci = bci.at[slot].set(chunk_ids)
        return (tuple(acc_p), aflag, tuple(bv), bflag, bci)

    totals, tflag, bv, bflag, bci = lax.fori_loop(0, r, body, carry0)

    # lifted segmented monoid over chunk totals -> exclusive offsets
    def lifted(a, b):
        va, fa = JPoint(*a[:3]), a[3]
        vb, fb = JPoint(*b[:3]), b[3]
        merged = jac.add(curve, va, vb)
        out = jac.select(fb, vb, merged, F)
        return (*tuple(out), fa | fb)

    def lifted_pad(k):
        return (*tuple(jac.identity(curve, (k,))), jnp.zeros((k,), bool))

    incl = inclusive_scan(lifted, (*totals, tflag), lifted_pad)
    idp = lifted_pad(1)
    excl = tuple(
        jnp.concatenate([i1, v[..., : l - 1]], axis=-1)
        for i1, v in zip(idp, incl)
    )

    # bucket-width offset apply: gather each tail's chunk offset, combine
    off = tuple(v[..., bci] for v in excl)
    total = lifted(off, (*bv, bflag))
    buckets = JPoint(*total[:3])
    return JPoint(
        F.slice_batch(buckets.x, 0, dump),
        F.slice_batch(buckets.y, 0, dump),
        F.slice_batch(buckets.z, 0, dump),
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


@functools.lru_cache(maxsize=None)
def _fixed_base_table(curve: CurveSpec, c: int, n_bits: int) -> JPoint:
    """Windowed table for fixed-base scalar mul: T[w, d] = d * 2^(c*w) * G.

    Built once per (curve, c, n_bits) and cached on device, normalized so
    evaluation runs on mixed adds. Layout: (windows, n_limbs[, 2], 2^c) with
    the window axis LEADING for lax.scan consumption.
    """
    F = jac.field_ops(curve)
    windows = -(-n_bits // c)
    width = 1 << c

    # row 0: [0, G, 2G, ..., (2^c - 1) G] via a prefix-sum of G replicas
    G = jac.generator(curve, (width - 1,))

    def combine(a, b):
        return tuple(jac.add(curve, JPoint(*a), JPoint(*b)))

    def pad(k):
        return tuple(jac.identity(curve, (k,)))

    prefixes = JPoint(*inclusive_scan(combine, tuple(G), pad))
    idp = jac.identity(curve, (1,))
    row = JPoint(
        F.concat([idp.x, prefixes.x]),
        F.concat([idp.y, prefixes.y]),
        F.concat([idp.z, prefixes.z]),
    )

    rows = []
    for w in range(windows):
        rows.append(jac.normalize(curve, row))
        if w + 1 < windows:
            row = lax.fori_loop(
                0, c, lambda _, p: tuple(jac.double(curve, JPoint(*p))), tuple(row)
            )
            row = JPoint(*row)
    table = JPoint(
        jnp.stack([r.x for r in rows]),
        jnp.stack([r.y for r in rows]),
        jnp.stack([r.z for r in rows]),
    )
    table = jax.device_put(table)
    jax.block_until_ready(table.x)
    return table


def fixed_base_msm(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    window_bits: int = 8,
    n_bits: Optional[int] = None,
) -> JPoint:
    """[k_i * G] for the curve generator: table gather + windows mixed adds.

    ~windows (= n_bits/c) mixed adds per scalar versus the ~2*n_bits
    add/double steps of a batched double-and-add — the Groth16 setup's
    query-encoding hot path (SURVEY.md section 3.1 setup MSMs).
    scalars: (n_limbs_scalar, N) canonical limbs.
    """
    nb = n_bits or curve.scalar.bits
    table = _fixed_base_table(curve, window_bits, nb)
    return _fixed_base_eval(curve, scalars, table, window_bits, nb)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _fixed_base_eval(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    table: JPoint,
    c: int,
    n_bits: int,
) -> JPoint:
    F = jac.field_ops(curve)
    n = scalars.shape[1]
    n_windows = -(-n_bits // c)
    digits_all = jnp.stack([_digits(scalars, w, c) for w in range(n_windows)])

    acc0 = tuple(jac.identity(curve, (n,)))

    def body(acc, xs):
        d, tx, ty, tz = xs
        pt = JPoint(tx[..., d], ty[..., d], tz[..., d])
        out = jac.madd(curve, JPoint(*acc), pt)
        return tuple(out), None

    acc, _ = lax.scan(body, acc0, (digits_all, table.x, table.y, table.z))
    return JPoint(*acc)


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
    total_bits = n_bits or curve.scalar.bits
    c = window_bits or _default_window_bits(n, total_bits)
    n_windows = -(-total_bits // c)

    # One batched inversion normalizes every point to Z in {0,1}: all
    # n_windows serial folds then run on the cheaper mixed add.
    points = jac.normalize(curve, points)

    # All window digits up front; the per-window bucket pipeline then runs
    # under lax.scan so it compiles once regardless of window count.
    digits_all = jnp.stack([_digits(scalars, w, c) for w in range(n_windows)])

    def window_body(_, d):
        buckets = _bucket_totals_fast(curve, points, d, c)
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
