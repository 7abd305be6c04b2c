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
from ..utils.aot_cache import aot_jit


#: window-group size cap: group * n gathered elements per group step. The
#: row gather fetches 128-u32 lane-padded ROWS (512 B/element incl. the
#: padding — see `_rows_of_points`), so 2^21 elements/step is a ~1 GB
#: transient gather plus its transposed copy. Measured optimal at 2^16-2^18
#: (grouping amortizes per-window launches); at n >= 2^20 a single window
#: already fills the chip and group=1 measured faster than group=2
#: (3.42 s vs 3.70 s at c=15; experiments/msm_ab_sweep20.py).
_GROUP_ELEMS_CAP = 1 << 21

#: grouping is disabled at n >= 2^20: one window already fills the chip and
#: the doubled gather transient costs more than the launch amortization
#: saves (c=12 at 2^20: group=1 3.07 s vs group=2 3.36 s,
#: experiments/msm_c12_probe.py)
_GROUP_DISABLE_N = 1 << 20


def _default_window_bits(n: int, total_bits: int = 255) -> int:
    """Pick c minimizing modeled EC-add work over all windows.

    Per window: ~0.8n mixed adds (segment-total pipeline) + ~5*2^c full
    adds (bucket-width lifted combine + the two weighted-total scans).

    Candidates that overflow the 32-bit packed sort key (c + ceil(log2 n) >
    `_MAX_SORT_BITS`) are excluded whenever a non-splitting c exists: the
    part-split path fragments the sort and pays a (parts-1) * 2^c
    tree-reduce per window, and measured end-to-end it loses — at 2^20 the
    model's unconstrained pick (c=15, parts=8) ran 3.70 s vs 3.07 s for the
    non-splitting c=12 (experiments/msm_ab_sweep20.py, round 4; this was
    VERDICT r3's flagship-size regression).
    """
    idx_bits = max(1, (n - 1).bit_length())
    c_max = _MAX_SORT_BITS - idx_bits
    candidates = [c for c in range(4, 17) if c <= c_max] or list(range(4, 17))
    best, best_cost = candidates[0], None
    for c in candidates:
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


def _gather_sorted(curve: CurveSpec, pts: JPoint, order, skip_z: bool):
    """Points in sort order. When `skip_z` (points normalized to Z in {0,1}
    AND every infinity's digit forced to 0 — see `_msm_jit`), Z is not
    gathered at all: digit-0 segments fold garbage that lands in the
    discarded bucket 0, so a constant Z = 1 is sound and saves a third of
    the gather traffic (the window-loop's dominant HBM cost at 2^18+).
    Multi-set callers (shared digits, per-set infinities) must gather Z."""
    F = jac.field_ops(curve)
    if not skip_z:
        return JPoint(
            F.take(pts.x, order), F.take(pts.y, order), F.take(pts.z, order)
        )
    xy = F.take(jnp.concatenate([pts.x, pts.y], axis=0), order)
    n_val = pts.x.shape[0]
    one = F.one(tuple(xy.shape[F.value_ndim:]))
    return JPoint(xy[:n_val], xy[n_val:], one)


def _segmented_bucket_sums(
    curve: CurveSpec, pts: JPoint, digits: jnp.ndarray, c: int,
    normalized: bool = False,
) -> JPoint:
    """Per-bucket EC sums for one window; returns buckets (batch = 2^c).

    Bucket b holds the sum of points whose digit == b (bucket 0 unused).
    """
    F = jac.field_ops(curve)
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = _gather_sorted(curve, pts, order, skip_z=normalized)

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


#: sort-key budget for the packed (digit, local-index) u32 sort. A test
#: shrinks this to force the part-split path at small sizes.
_MAX_SORT_BITS = 32


def _rows_of_points(curve: CurveSpec, pts: JPoint, gather_z: bool):
    """Row-major (N, Kp) copy of the point coords, lane-padded to 128 u32.

    The sorted-order gather then fetches 512-byte contiguous ROWS: measured
    4x faster than minor-axis gathers on the limb-planar (K, N) layout at
    n=2^20 (experiments/gather_probe.py — 14 ms vs 57 ms for 2^20 rows),
    and one dense transpose (~5 ms) restores the limb-planar layout."""
    n = pts.x.shape[-1]
    coords = [pts.x, pts.y] + ([pts.z] if gather_z else [])
    flat = jnp.concatenate([v.reshape((-1, n)) for v in coords], axis=0)
    k = flat.shape[0]
    kp = -(-k // 128) * 128
    rows = flat.T
    if kp != k:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n, kp - k), jnp.uint32)], axis=1
        )
    return rows


def _gather_rows(
    curve: CurveSpec, pts: JPoint, rows: jnp.ndarray, order, skip_z: bool
) -> JPoint:
    """rows[order] (contiguous-row gather), then ONE transpose back to the
    limb-planar layout, split into coords shaped value + order.shape."""
    F = jac.field_ops(curve)
    got = rows[order]  # (*order.shape, Kp)
    planar = jnp.moveaxis(got, -1, 0)  # (Kp, *order.shape)
    bshape = order.shape

    def take_coord(off, tmpl):
        size = 1
        for d in tmpl.shape[:-1]:
            size *= d
        v = planar[off : off + size]
        return v.reshape(tmpl.shape[:-1] + bshape), off + size

    x, off = take_coord(0, pts.x)
    y, off = take_coord(off, pts.y)
    if skip_z:
        z = F.one(tuple(x.shape[F.value_ndim :]))
    else:
        z, off = take_coord(off, pts.z)
    return JPoint(x, y, z)


def _bucket_totals_fast(
    curve: CurveSpec, pts: JPoint, digits: jnp.ndarray, c: int,
    normalized: bool = False, multi_set: bool = False,
    rows: Optional[jnp.ndarray] = None,
) -> JPoint:
    """Segment-TOTAL bucket accumulation: ~n mixed adds per window.

    Improves on `_segmented_bucket_sums` (a full segmented prefix scan,
    ~2n full adds) by exploiting two facts: (1) only segment tails are
    needed, and there are at most 2^c of them, so the cross-chunk offset
    fix-up runs at bucket width instead of batch width; (2) the points are
    pre-normalized (Z in {0,1}), so the serial intra-chunk fold uses the
    cheaper mixed add.

    Pipeline: single-operand sort of packed (digit, index) u32 keys; serial
    fold over R columns of the (L, R) chunk grid under ONE fori_loop,
    scattering each tail's chunk-local prefix (plus its chunk index and
    segment-start flag) into the bucket arrays as it appears; lifted
    segmented scan over the L chunk totals; one bucket-width gather +
    lifted combine applies cross-chunk offsets.
    Requires pts normalized (`jacobian.normalize`).

    When c + log2(n) exceeds the 32-bit key budget, the batch splits into
    PARTS that sort independently (local indices stay packable) and own
    separate bucket arrays, tree-reduced at the end: (P-1) full adds per
    bucket buys keeping the single-operand sort — the variadic argsort
    fallback measured ~40x slower at 2^20 (experiments/msm_profile.py).

    multi_set: pts carries an extra SET axis right after the value dims
    (shape (n_limbs[, 2], S, N)) sharing ONE digit array — the sort, index
    algebra, and every kernel launch are amortized across the S point sets
    (the Groth16 prover's a/b1/l queries share the assignment scalars).
    Per-set infinities can't be digit-masked, so Z is gathered and the
    madd identity masks absorb them.

    rows: optional `_rows_of_points` copy for the fast contiguous-row
    gather; required from the grouped/scan callers (falls back to the
    limb-planar gather when None, e.g. the tiny-n fallback path).
    """
    F = jac.field_ops(curve)
    g0 = digits.shape[:-1]  # caller's window-GROUP axes (() or (G,))
    n0 = digits.shape[-1]
    idx_bits0 = max(1, (n0 - 1).bit_length())

    r_probe = 32
    while r_probe > 1 and (n0 % r_probe or n0 // r_probe < 8):
        r_probe //= 2
    if r_probe < 4:
        assert not g0 and not multi_set, (
            "grouped/multi-set paths require n >= 32 (caller guards)"
        )
        return _segmented_bucket_sums(curve, pts, digits, c, normalized)

    parts = 1 << max(0, c + idx_bits0 - _MAX_SORT_BITS)
    n = n0 // parts
    assert n0 % parts == 0 and n >= 32, (n0, parts, c)
    if parts > 1:
        # rows q of the flattened (G*P, n/P) digit grid map to part q % P
        digits = digits.reshape((-1, n))
        g = (digits.shape[0],)
    else:
        g = g0
    idx_bits = max(1, (n - 1).bit_length())
    assert c + idx_bits <= _MAX_SORT_BITS

    # pack (digit, local index) into ONE u32 and sort a single array: the
    # TPU fast path (variadic key+payload sorts are dramatically slower)
    packed = (digits.astype(jnp.uint32) << jnp.uint32(idx_bits)) | (
        jnp.arange(n, dtype=jnp.uint32)
    )
    ps = jnp.sort(packed, axis=-1)
    order = (ps & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    sd = (ps >> jnp.uint32(idx_bits)).astype(jnp.int32)
    if parts > 1:
        offs = (jnp.arange(g[0], dtype=jnp.int32) % parts) * n
        order = order + offs[:, None]  # part-local -> global point index

    fullm1 = jnp.full(g + (1,), -1, sd.dtype)
    starts = sd != jnp.concatenate([fullm1, sd[..., :-1]], axis=-1)
    tails = sd != jnp.concatenate([sd[..., 1:], fullm1], axis=-1)

    r = 32
    while r > 1 and (n % r or n // r < 8):
        r //= 2
    assert r >= 4, (n, r)
    l = n // r
    dump = 1 << c
    width = dump + 1

    # element chunk*r + j <-> (chunk, column j), stored COLUMN-major
    # (..., r, l): the fold slices one column per step, and column-major
    # keeps those slices contiguous (chunk-major slicing is stride-r — every
    # 4-byte element pulls a full HBM burst). The points are gathered
    # directly into this layout by permuting the (tiny) index array.
    def rt(v):
        return jnp.moveaxis(v.reshape(v.shape[:-1] + (l, r)), -1, -2)

    skip_z = normalized and not multi_set
    if rows is not None:
        sp = _gather_rows(curve, pts, rows, rt(order), skip_z=skip_z)
    else:
        sp = _gather_sorted(curve, pts, rt(order), skip_z=skip_z)
    cps = sp  # (..., r, l) already
    st2 = rt(starts)
    # point-value batch prefix: digit axes g, plus the set axis when
    # multi_set — identities/pads on the point side must carry it
    sb = sp.x.shape[F.value_ndim : -2]

    gi = jnp.arange(g[0])[:, None] if g else None  # (G, 1) batch index

    def scatter_last(dst, idx, src):
        """Per-group scatter along the last axis: dst (..., *g, W),
        idx (*g, k), src (..., *g, k)."""
        if gi is None:
            return dst.at[..., idx].set(src)
        return dst.at[..., gi, idx].set(src)

    def gather_last(v, idx):
        if gi is None:
            return v[..., idx]
        return v[..., gi, idx]

    # Bucket -> (chunk, column) tail coordinates, computed STATICALLY from
    # the sorted digits with three int32/bool scatters (4 bytes/element).
    # The fold then only has to RECORD its column prefixes (in-place
    # dynamic_update_slice, pure sequential writes); the old design
    # scattered the full-width accumulator into the bucket array at every
    # column — an O(point-size * n) random read-modify-write per window that
    # dominated the 2^20 wall-clock.
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), g + (n,))
    slot_tail = jnp.where(tails & (sd > 0), sd, dump)
    slot_start = jnp.where(starts & (sd > 0), sd, dump)
    tail_pos = scatter_last(jnp.zeros(g + (width,), jnp.int32), slot_tail, pos)
    start_pos = scatter_last(jnp.zeros(g + (width,), jnp.int32), slot_start, pos)
    occ = scatter_last(
        jnp.zeros(g + (width,), bool), slot_tail, jnp.ones(g + (n,), bool)
    )
    chunk_b = tail_pos // r
    col_b = tail_pos % r
    # tail value complete iff its segment started inside the same chunk;
    # unoccupied buckets carry the identity (flag True keeps it in `lifted`)
    bflag = (start_pos // r == chunk_b) | ~occ

    totals, bufs = _fold_columns(curve, cps, st2, skip_z, multi_set, F, sb, l, r)
    tflag = st2.any(axis=-2)  # chunk contains a segment start

    # lifted segmented monoid over chunk totals -> exclusive offsets
    def lifted(a, b):
        va, fa = JPoint(*a[:3]), a[3]
        vb, fb = JPoint(*b[:3]), b[3]
        merged = jac.add(curve, va, vb)
        out = jac.select(fb, vb, merged, F)
        return (*tuple(out), fa | fb)

    def lifted_pad(k):
        return (*tuple(jac.identity(curve, sb + (k,))), jnp.zeros(g + (k,), bool))

    incl = inclusive_scan(lifted, (*totals, tflag), lifted_pad)
    idp = lifted_pad(1)
    excl = tuple(
        jnp.concatenate([i1, v[..., : l - 1]], axis=-1)
        for i1, v in zip(idp, incl)
    )

    # bucket-width extraction: tail prefix values from the fold buffers,
    # chunk offsets from the lifted scan, one `lifted` combine applies them
    def pick(bf):  # bf is column-major (..., r, l): index [col, chunk]
        if gi is None:
            return bf[..., col_b, chunk_b]
        return bf[..., gi, col_b, chunk_b]

    idw = jac.identity(curve, sb + (width,))
    bv = jac.select(occ, JPoint(*(pick(bf) for bf in bufs)), idw, F)
    off = tuple(gather_last(v, chunk_b) for v in excl)
    total = lifted(off, (*tuple(bv), bflag))
    buckets = JPoint(*total[:3])
    buckets = JPoint(
        F.slice_batch(buckets.x, 0, dump),
        F.slice_batch(buckets.y, 0, dump),
        F.slice_batch(buckets.z, 0, dump),
    )
    if parts > 1:
        # (..., G*P, 2^c) -> (..., *g0, P, 2^c), tree-reduce the parts axis
        def unsplit(v):
            return v.reshape(v.shape[:-2] + g0 + (parts, dump))

        cur = JPoint(unsplit(buckets.x), unsplit(buckets.y), unsplit(buckets.z))
        p_live = parts
        while p_live > 1:
            half = p_live // 2
            a = JPoint(*(v[..., :half, :] for v in cur))
            b = JPoint(*(v[..., half:p_live, :] for v in cur))
            cur = jac.add(curve, a, b)
            p_live = half
        buckets = JPoint(*(v[..., 0, :] for v in cur))
    return buckets


#: fold-kernel mode: "on" = fused Pallas kernel on TPU (jnp fold
#: elsewhere), "interpret" = Pallas interpreter (CPU test coverage),
#: "off" = always the jnp fori_loop fold.
#:
#: DEFAULT OFF: the compiled kernel MISCOMPILES inside the production MSM
#: graph on real TPU (round 5, reproduced deterministically at n=2^13,
#: c=12 — ~60% of bucket totals come back as different group elements).
#: The fault is context-dependent, not in the kernel logic: the SAME
#: kernel is bit-exact (a) in interpret mode, (b) compiled standalone on
#: the same captured operands, and (c) compiled in a jit that computes
#: its operands in-graph; it corrupts only when the operands arrive as
#: jit parameters (the production `_msm_jit` signature), and
#: lax.optimization_barrier isolation does not help — which points at
#: XLA parameter-layout interaction with the Mosaic custom call through
#: the axon PJRT backend. Repro: /tmp-style scripts archived in
#: experiments/msm_foldkernel_repro.py. The jnp fold costs ~0 at 2^16-18
#: (grouped sizes exceed the kernel's VMEM budget anyway, so the kernel
#: never engaged there) and is the known-good r04 path at 2^20.
_FOLD_KERNEL_MODE = "off"


def _fold_columns(curve, cps, st2, skip_z, multi_set, F, sb, l, r):
    """Serial madd fold over the r sorted columns, returning (totals, bufs).

    Routes through the fused Pallas fold kernel (ops.ec_kernel.fold_madd:
    one launch per window folding all r columns and writing every prefix)
    when the platform and block budget allow; falls back to the r-step
    fori_loop of separate madd launches otherwise. Multi-set inputs run
    the kernel once per SET (the set slices are independent folds; sort +
    gather stay amortized) to keep blocks inside the VMEM budget.
    """
    from . import ec_kernel

    mode = _FOLD_KERNEL_MODE
    use_kernel = mode == "interpret" or (
        mode in ("on", "auto") and jac._pallas_ec(curve)
    )
    if use_kernel:
        interp = mode == "interpret"
        ext = curve.ext
        if multi_set:
            n_sets = cps.z.shape[F.value_ndim]
            mid = cps.z.shape[F.value_ndim + 1 : -2]
        else:
            n_sets = 0
            mid = cps.z.shape[F.value_ndim : -2]
        midp = 1
        for d in mid:
            midp *= d
        lb = ec_kernel.fold_block_lanes(
            curve.base.n_limbs, ext, midp, r, skip_z
        )
        if not lb or l % lb:
            use_kernel = False
    if use_kernel:
        sl = (slice(None),) * F.value_ndim

        def run(coords):
            bufs, totals = ec_kernel.fold_madd(
                curve.base, st2, coords,
                ext=ext, beta=curve.nr2, a=curve.a, skip_z=skip_z,
                interpret=interp,
            )
            return totals, bufs

        if not multi_set:
            coords = (cps.x, cps.y) if skip_z else (cps.x, cps.y, cps.z)
            return run(coords)
        per_set = [
            run((cps.x[sl + (s,)], cps.y[sl + (s,)], cps.z[sl + (s,)]))
            for s in range(n_sets)
        ]
        totals = tuple(
            jnp.stack([p[0][i] for p in per_set], axis=F.value_ndim)
            for i in range(3)
        )
        bufs = tuple(
            jnp.stack([p[1][i] for p in per_set], axis=F.value_ndim)
            for i in range(3)
        )
        return totals, bufs

    acc0 = tuple(jac.identity(curve, sb + (l,)))
    buf0 = tuple(jnp.zeros(v.shape, jnp.uint32) for v in cps)

    def col(v, j):
        return lax.squeeze(
            lax.dynamic_slice_in_dim(v, j, 1, axis=v.ndim - 2), (v.ndim - 2,)
        )

    def body(j, carry):
        acc, bufs = carry
        q = JPoint(col(cps.x, j), col(cps.y, j), col(cps.z, j))
        s = col(st2, j)
        summed = jac.madd(curve, JPoint(*acc), q)
        acc_p = jac.select(s, q, summed, F)
        bufs = tuple(
            lax.dynamic_update_slice_in_dim(
                b, a[..., None, :], j, axis=b.ndim - 2
            )
            for b, a in zip(bufs, acc_p)
        )
        return (tuple(acc_p), bufs)

    return lax.fori_loop(0, r, body, (acc0, buf0))


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
    lead = buckets.z.shape[F.value_ndim : -1]  # window-group batch axes

    def combine(a, b):
        return tuple(jac.add(curve, JPoint(*a), JPoint(*b)))

    def pad(k):
        return tuple(jac.identity(curve, lead + (k,)))

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

    Built once per (curve, c, n_bits) and cached on device, normalized
    (affine, Z in {0,1}) so evaluation runs on mixed adds. Layout:
    (windows, n_limbs[, 2], 2^c) with the window axis LEADING for lax.scan
    consumption.

    The rows are computed on the HOST (~windows * 2^c affine adds of Python
    bigints, a one-time few-second cost, disk-cached): the previous on-device
    build instantiated the unrolled Pallas EC kernel at a dozen distinct scan
    widths, costing minutes of Mosaic compile per curve — for a table whose
    arithmetic is trivially cheap.
    """
    import os
    import pathlib
    import tempfile

    import numpy as np

    from ..ref import curve as refc

    windows = -(-n_bits // c)
    width = 1 << c
    cache = pathlib.Path(
        os.environ.get("OZL_CACHE_DIR", tempfile.gettempdir())
    ) / f"ozl_fbtable_{curve.name}_{c}_{n_bits}.npz"
    if cache.exists():
        try:
            data = np.load(cache)
            table = JPoint(
                jnp.asarray(data["x"]), jnp.asarray(data["y"]), jnp.asarray(data["z"])
            )
            jax.block_until_ready(table.x)
            return table
        except Exception:
            pass  # corrupt/stale cache: rebuild

    flat = []
    base = refc.generator(curve)
    for w in range(windows):
        acc = None
        flat.append(None)  # d = 0
        for _ in range(1, width):
            acc = refc.add(curve, acc, base)
            flat.append(acc)
        if w + 1 < windows:
            for _ in range(c):
                base = refc.add(curve, base, base)

    pts = jac.from_affine_ints(curve, flat)  # (n[,2], windows*width), Z in {0,1}

    def rows_first(v):
        return jnp.moveaxis(v.reshape(v.shape[:-1] + (windows, width)), -2, 0)

    table = JPoint(rows_first(pts.x), rows_first(pts.y), rows_first(pts.z))
    try:
        tmp = cache.with_suffix(".tmp.npz")
        np.savez(tmp, x=np.asarray(table.x), y=np.asarray(table.y), z=np.asarray(table.z))
        tmp.rename(cache)
    except Exception:
        pass
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


@functools.partial(aot_jit, static_argnums=(0, 3, 4))
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


def msm_multi(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    points_list,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
):
    """One MSM per point set against a SHARED scalar vector.

    The Pippenger pipeline's scalar-side work (digit extraction, per-window
    sort, bucket index algebra) and every kernel launch are amortized across
    the sets by batching the point arrays on a set axis just after the limb
    dims — the Groth16 prover's a/b1/l query MSMs all consume the same
    assignment vector (the reference delegates to ArkGroth16::prove at
    plugins/arkworks/src/groth16.rs:446-457; the a_query/b_g1_query over the
    full assignment and l_query over the aux assignment live in the upstream
    arkworks create_proof internals).
    Identity points inside a set (zero query coefficients) are absorbed by
    the mixed-add masks, so sets need no per-set digit masking.

    Returns a list of scalar-batch JPoints, one per set.
    """
    F = jac.field_ops(curve)
    n = scalars.shape[1]
    assert all(p.x.shape[-1] == n for p in points_list)
    # pad to pow2 (min 64: the fast bucket pipeline needs chunkable widths)
    padded = max(64, 1 << (n - 1).bit_length())
    if padded != n:
        scalars = jnp.concatenate(
            [
                jnp.asarray(scalars),
                jnp.zeros((scalars.shape[0], padded - n), dtype=jnp.uint32),
            ],
            axis=1,
        )
        pad_pts = jac.identity(curve, (padded - n,))
        points_list = [
            JPoint(
                F.concat([p.x, pad_pts.x]),
                F.concat([p.y, pad_pts.y]),
                F.concat([p.z, pad_pts.z]),
            )
            for p in points_list
        ]
    stacked = JPoint(
        *(
            jnp.stack([getattr(p, f) for p in points_list], axis=F.value_ndim)
            for f in ("x", "y", "z")
        )
    )
    out = _msm_multi_jit(curve, scalars, stacked, window_bits, n_bits)
    return [
        JPoint(out.x[..., s], out.y[..., s], out.z[..., s])
        for s in range(len(points_list))
    ]


@functools.partial(aot_jit, static_argnums=(0, 3, 4))
def _msm_multi_jit(
    curve: CurveSpec,
    scalars: jnp.ndarray,
    points: JPoint,
    window_bits: Optional[int] = None,
    n_bits: Optional[int] = None,
) -> JPoint:
    F = jac.field_ops(curve)
    n = scalars.shape[1]
    n_sets = points.z.shape[F.value_ndim]
    total_bits = n_bits or curve.scalar.bits
    c = window_bits or _default_window_bits(n, total_bits)
    n_windows = -(-total_bits // c)

    points = jac.normalize(curve, points)
    rows = _rows_of_points(curve, points, gather_z=True)
    digits_all = jnp.stack([_digits(scalars, w, c) for w in range(n_windows)])
    # (no infinity digit-masking: Z is gathered in the multi-set pipeline
    # and per-set identities fall out of the madd masks)

    group = (
        min(n_windows, max(1, _GROUP_ELEMS_CAP // (n * n_sets)))
        if 256 <= n < _GROUP_DISABLE_N
        else 1
    )
    w_pad = -(-n_windows // group) * group
    if w_pad != n_windows:
        digits_all = jnp.concatenate(
            [digits_all, jnp.zeros((w_pad - n_windows, n), digits_all.dtype)]
        )

    if group > 1:
        dg = digits_all.reshape(w_pad // group, group, n)

        def group_body(_, d):
            b = _bucket_totals_fast(
                curve, points, d, c, normalized=True, multi_set=True,
                rows=rows,
            )
            return None, tuple(b)

        _, bstack = lax.scan(group_body, None, dg)

        # leaves: (w/G, n_val..., S, G, 2^c) -> (n_val..., S, w, 2^c)
        def flat(v):
            v = jnp.moveaxis(v, 0, -3)
            return v.reshape(v.shape[:-3] + (w_pad, v.shape[-1]))

        buckets = JPoint(flat(bstack[0]), flat(bstack[1]), flat(bstack[2]))
    else:

        def window_body(_, d):
            b = _bucket_totals_fast(
                curve, points, d, c, normalized=True, multi_set=True,
                rows=rows,
            )
            return None, tuple(b)

        _, bstack = lax.scan(window_body, None, digits_all)
        # leaves: (w, n_val..., S, 2^c) -> (n_val..., S, w, 2^c)
        buckets = JPoint(*(jnp.moveaxis(v, 0, -2) for v in bstack))

    total = _weighted_bucket_total(curve, buckets, c)  # batch (S, w)
    sums = JPoint(*(jnp.moveaxis(v, -1, 0) for v in total))  # lead = window

    def horner_body(acc, sum_w):
        acc = lax.fori_loop(
            0, c, lambda _, a: tuple(jac.double(curve, JPoint(*a))), acc
        )
        acc = jac.add(curve, JPoint(*acc), JPoint(*sum_w))
        return tuple(acc), None

    top = tuple(v[-1] for v in sums)
    rest = tuple(v[: w_pad - 1][::-1] for v in sums)
    acc, _ = lax.scan(horner_body, top, rest)
    return JPoint(*acc)  # batch (S,)


@functools.partial(aot_jit, static_argnums=(0, 3, 4))
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
    rows = _rows_of_points(curve, points, gather_z=False)

    # All window digits up front. Infinities (from padding) get digit 0 in
    # EVERY window: they land in the discarded bucket 0, which lets the
    # bucket pipeline skip gathering Z.
    digits_all = jnp.stack([_digits(scalars, w, c) for w in range(n_windows)])
    inf = jac.field_ops(curve).is_zero(points.z)
    digits_all = jnp.where(inf[None], 0, digits_all)

    # Windows run in GROUPS of G as a leading batch axis of the bucket
    # pipeline: every sort/gather/fold/scan launch then serves G windows
    # (the per-window pipeline is launch-overhead-bound — each Pallas EC
    # call costs ~130 us to launch regardless of width). G is capped so the
    # gathered per-group points stay a few hundred MB.
    group = (
        min(n_windows, max(1, _GROUP_ELEMS_CAP // n))
        if 256 <= n < _GROUP_DISABLE_N
        else 1
    )
    w_pad = -(-n_windows // group) * group
    if w_pad != n_windows:
        # zero-digit pad windows: all points land in discarded bucket 0, so
        # their window sums are the identity (harmless extra Horner steps)
        digits_all = jnp.concatenate(
            [digits_all, jnp.zeros((w_pad - n_windows, n), digits_all.dtype)]
        )

    F = jac.field_ops(curve)
    if group > 1:
        dg = digits_all.reshape(w_pad // group, group, n)

        def group_body(_, d):
            buckets = _bucket_totals_fast(
                curve, points, d, c, normalized=True, rows=rows
            )
            return None, tuple(buckets)

        _, bstack = lax.scan(group_body, None, dg)
        # leaves: (w/G, n_val..., G, 2^c) -> batch (w, 2^c)

        def flat(v):
            v = jnp.moveaxis(v, 0, F.value_ndim)  # (n_val..., w/G, G, 2^c)
            return v.reshape(
                v.shape[: F.value_ndim] + (w_pad,) + v.shape[F.value_ndim + 2 :]
            )

        buckets = JPoint(flat(bstack[0]), flat(bstack[1]), flat(bstack[2]))
    else:

        def window_body(_, d):
            b = _bucket_totals_fast(
                curve, points, d, c, normalized=True, rows=rows
            )
            return None, tuple(b)

        _, bstack = lax.scan(window_body, None, digits_all)
        # collect ALL windows' buckets (w * 2^c * point size is a few tens
        # of MB), then run ONE weighted-total pass: the per-window weighted
        # scans were ~50 small serial EC launches each — pure launch
        # overhead at the 2^20 flagship size where grouping is disabled
        buckets = JPoint(*(jnp.moveaxis(v, 0, F.value_ndim) for v in bstack))
    # ONE weighted-total pass over all windows at once
    total = _weighted_bucket_total(curve, buckets, c)  # batch (w,)
    sums = JPoint(*(jnp.moveaxis(v, -1, 0) for v in total))

    # Horner from the most significant window: acc = 2^c * acc + S_w
    # (doublings under fori_loop: one `double` instance in the graph)
    def horner_body(acc, sum_w):
        acc = lax.fori_loop(
            0, c, lambda _, a: tuple(jac.double(curve, JPoint(*a))), acc
        )
        acc = jac.add(curve, JPoint(*acc), JPoint(*sum_w))
        return tuple(acc), None

    top = tuple(v[-1] for v in sums)
    rest = tuple(v[: w_pad - 1][::-1] for v in sums)
    acc, _ = lax.scan(horner_body, top, rest)
    return JPoint(*acc)
