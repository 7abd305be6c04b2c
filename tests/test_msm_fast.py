"""Fast-suite coverage of the MSM segment-total pipeline (toy curve).

The production-curve MSM tests are heavy-marked (24-limb EC graphs take
minutes to compile on XLA:CPU); the 2-limb toy curve drives the IDENTICAL
code — `jacobian.normalize` / `madd` mixed adds, the chunked segment-total
bucket accumulation in `ops.msm._bucket_totals_fast`, and the weighted
bucket reduction — with ~16x smaller graphs.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from openzl_tpu.curves import jacobian as jac
from openzl_tpu.curves.spec import toy_curve
from openzl_tpu.fields import limb
from openzl_tpu.ops.msm import msm
from openzl_tpu.ref import curve as ref

RNG = random.Random(0xFA57)


@pytest.fixture(scope="module")
def curve():
    return toy_curve()


def _points(curve, n):
    return [ref.random_point(curve, RNG) for _ in range(n)]


def test_batch_inv_matches_fermat(curve):
    F = jac.field_ops(curve)
    p = curve.base.modulus
    vals = [RNG.randrange(1, p) for _ in range(37)]
    x = jnp.asarray(F.from_ints(np.array(vals, dtype=object)))
    got = [int(v) for v in F.to_ints(np.asarray(jac.batch_inv(F, x)))]
    assert got == [pow(v, -1, p) for v in vals]


def test_normalize_preserves_points(curve):
    n = 16
    pts = _points(curve, n - 1) + [None]
    P = jac.from_affine_ints(curve, pts)
    # un-normalize: scale each Z by i+2 so inputs have Z != 1
    F = jac.field_ops(curve)
    s = jnp.asarray(F.from_ints(np.array(range(2, n + 2), dtype=object)))
    s2, s3 = F.sqr(s), F.mul(F.sqr(s), s)
    Q = jac.JPoint(F.mul(P.x, s2), F.mul(P.y, s3), F.mul(P.z, s))
    N = jac.normalize(curve, Q)
    # Z must be exactly 1 (0 for identity), and affine values unchanged
    z = [int(v) for v in F.to_ints(np.asarray(N.z))]
    assert z == [1] * (n - 1) + [0]
    assert jac.to_affine_ints(curve, N) == pts


def test_madd_matches_add(curve):
    base = _points(curve, 6)
    # pairs covering: generic, identity on either side, double, inverse
    p0, p1, p2, p3, _, _ = base
    p2_neg = (p2[0], curve.base.modulus - p2[1])
    pairs = [
        (p0, p1),
        (p0, None),
        (None, p1),
        (None, None),
        (p2, p2),
        (p2, p2_neg),
    ]
    P = jac.from_affine_ints(curve, [a for a, _ in pairs])
    Q = jac.from_affine_ints(curve, [b for _, b in pairs])
    got = jac.to_affine_ints(curve, jac.madd(curve, P, Q))
    want = [ref.add(curve, a, b) for a, b in pairs]
    assert got == want


@pytest.mark.parametrize("n,c", [(64, 4), (256, 5)])
def test_msm_fast_path_vs_oracle(curve, n, c):
    """n >= 32 so the chunked segment-total path (not the tiny-n fallback)
    runs; duplicate digits, zero scalars, and identity points included."""
    pts = _points(curve, n - 1) + [None]
    ks = [RNG.randrange(1 << 16) for _ in range(n - 3)] + [0, 1, 7]
    want = ref.msm(curve, ks, pts)
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    got = jac.to_affine_ints(curve, msm(curve, scal, P, c, 16))
    assert got == want


def test_fixed_base_msm_vs_oracle(curve):
    from openzl_tpu.ops.msm import fixed_base_msm

    n = 32
    ks = [RNG.randrange(1 << 16) for _ in range(n - 2)] + [0, 1]
    scal = jnp.asarray(limb.pack(curve.scalar, np.array(ks, dtype=object)))
    got = jac.to_affine_ints(
        curve, fixed_base_msm(curve, scal, window_bits=4, n_bits=16)
    )
    G = ref.generator(curve)
    assert got == [ref.scalar_mul(curve, k, G) for k in ks]


def test_msm_grouped_window_padding(curve, monkeypatch):
    """Force a group size that does NOT divide the window count so the
    zero-digit pad windows (and their identity Horner steps) are exercised."""
    from openzl_tpu.ops import msm as msmmod

    monkeypatch.setattr(msmmod, "_GROUP_ELEMS_CAP", 512)
    n = 256  # group = 512 // 256 = 2; windows = ceil(15/4) = 4 -> no pad;
    # use n_bits=15, c=4 -> 4 windows, group 2 divides; instead c=5 -> 3
    # windows, group 2 -> w_pad = 4 != 3
    pts = _points(curve, n - 1) + [None]
    ks = [RNG.randrange(1 << 15) for _ in range(n - 2)] + [0, 1]
    want = ref.msm(curve, ks, pts)
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    got = jac.to_affine_ints(curve, msm(curve, scal, P, 5, 15))
    assert got == want


def test_msm_many_duplicate_digits(curve):
    """Every point shares one bucket -> single long segment spanning chunks."""
    n = 64
    base = ref.random_point(curve, RNG)
    pts = [base] * n
    ks = [3] * n
    want = ref.msm(curve, ks, pts)
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    got = jac.to_affine_ints(curve, msm(curve, scal, P, 4, 8))
    assert got == want


@pytest.mark.parametrize("grouped", [False, True])
def test_msm_multi_matches_individual(curve, monkeypatch, grouped):
    """Shared-scalar multi-set MSM == per-set msm(), with identity points
    scattered inside the sets (zero query coefficients in Groth16) and a
    non-pow2 length exercising the pad path."""
    from openzl_tpu.ops import msm as msmmod
    from openzl_tpu.ops.msm import msm_multi

    if grouped:
        # padded n = 512, 3 sets: group = 4096 // (512*3) = 2 > 1, so the
        # grouped multi-set path (lax.scan over window groups) really runs
        # (n must be >= 256 or _msm_multi_jit forces group = 1)
        monkeypatch.setattr(msmmod, "_GROUP_ELEMS_CAP", 4096)
    n = 300 if grouped else 100  # pads to 512 / 128
    ks = [RNG.randrange(1 << 15) for _ in range(n - 2)] + [0, 1]
    sets = []
    for s in range(3):
        pts = _points(curve, n)
        for i in range(s, n, 7 + s):  # per-set identity positions
            pts[i] = None
        sets.append(pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    plist = [jac.from_affine_ints(curve, pts) for pts in sets]
    outs = msm_multi(curve, scal, plist, window_bits=4, n_bits=15)
    assert len(outs) == 3
    for pts, out in zip(sets, outs):
        want = ref.msm(curve, ks, pts)
        assert jac.to_affine_ints(curve, out) == want
        # and agrees with the single-set pipeline
        single = msm(curve, scal, jac.from_affine_ints(curve, pts), 4, 15)
        assert jac.to_affine_ints(curve, single) == want


@pytest.mark.parametrize("multi", [False, True])
def test_fold_kernel_interpret_matches_jnp(curve, monkeypatch, multi):
    """The fused Pallas fold kernel (ops.ec_kernel.fold_madd, interpret
    mode on CPU) must reproduce the jnp fori_loop fold bit-exactly through
    the full MSM pipeline — identities, duplicate digits, and the start-
    select path included. Production uses the compiled kernel on TPU."""
    from openzl_tpu.ops import msm as msmmod
    from openzl_tpu.ops.msm import msm_multi

    n = 4096  # r=32 -> l=128: minimum fold-kernel block width
    ks = [RNG.randrange(1 << 15) for _ in range(n - 2)] + [0, 1]
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    if multi:
        sets = []
        for s in range(2):
            pts = _points(curve, n)
            for i in range(s, n, 501 + s):
                pts[i] = None
            sets.append(pts)
        plist = [jac.from_affine_ints(curve, pts) for pts in sets]
        monkeypatch.setattr(msmmod, "_FOLD_KERNEL_MODE", "interpret")
        outs = msm_multi(curve, scal, plist, window_bits=4, n_bits=15)
        for pts, out in zip(sets, outs):
            assert jac.to_affine_ints(curve, out) == ref.msm(curve, ks, pts)
    else:
        pts = _points(curve, n)
        pts[17] = None
        P = jac.from_affine_ints(curve, pts)
        want = ref.msm(curve, ks, pts)
        monkeypatch.setattr(msmmod, "_FOLD_KERNEL_MODE", "interpret")
        got = jac.to_affine_ints(curve, msm(curve, scal, P, 4, 15))
        assert got == want


def test_fixed_base_table_disk_cache(curve, tmp_path, monkeypatch):
    """`_fixed_base_table` must round-trip through its .npz disk cache: the
    first call writes the file, a fresh call (lru cleared, host EC oracle
    disabled) must LOAD it rather than rebuild (VERDICT r3: the save/load
    path silently never ran because of a missing numpy import)."""
    from openzl_tpu.ops import msm as msmmod
    from openzl_tpu.ref import curve as refc

    monkeypatch.setenv("OZL_CACHE_DIR", str(tmp_path))
    msmmod._fixed_base_table.cache_clear()
    try:
        t1 = msmmod._fixed_base_table(curve, 4, 16)
        files = list(tmp_path.glob("ozl_fbtable_*.npz"))
        assert len(files) == 1, "table build must write the disk cache"
        # simulate a fresh process: clear the lru cache and make the host
        # builder unusable — success proves the disk load path works
        msmmod._fixed_base_table.cache_clear()

        def boom(*a, **k):
            raise AssertionError("table rebuilt instead of disk-loaded")

        monkeypatch.setattr(refc, "generator", boom)
        t2 = msmmod._fixed_base_table(curve, 4, 16)
        assert (np.asarray(t1.x) == np.asarray(t2.x)).all()
        assert (np.asarray(t1.y) == np.asarray(t2.y)).all()
        assert (np.asarray(t1.z) == np.asarray(t2.z)).all()
    finally:
        msmmod._fixed_base_table.cache_clear()


def test_msm_part_split_sort(curve, monkeypatch):
    """Shrink the packed sort-key budget so the batch splits into 4
    independently-sorted parts with per-part bucket arrays (the path big
    MSMs take when c + log2(n) > 32); result must be unchanged."""
    from openzl_tpu.ops import msm as msmmod

    monkeypatch.setattr(msmmod, "_MAX_SORT_BITS", 10)  # c=4 + idx 8 -> P=4
    n = 256
    pts = _points(curve, n - 1) + [None]
    ks = [RNG.randrange(1 << 15) for _ in range(n - 2)] + [0, 1]
    want = ref.msm(curve, ks, pts)
    P = jac.from_affine_ints(curve, pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    got = jac.to_affine_ints(curve, msm(curve, scal, P, 4, 15))
    assert got == want


def test_msm_multi_part_split(curve, monkeypatch):
    """Multi-set + part-split sort together (grouped window path)."""
    from openzl_tpu.ops import msm as msmmod
    from openzl_tpu.ops.msm import msm_multi

    monkeypatch.setattr(msmmod, "_MAX_SORT_BITS", 10)
    monkeypatch.setattr(msmmod, "_GROUP_ELEMS_CAP", 1024)
    n = 256
    ks = [RNG.randrange(1 << 15) for _ in range(n - 2)] + [0, 1]
    sets = []
    for s in range(2):
        pts = _points(curve, n)
        for i in range(s, n, 9 + s):
            pts[i] = None
        sets.append(pts)
    scal = limb.pack(curve.scalar, np.array(ks, dtype=object))
    plist = [jac.from_affine_ints(curve, pts) for pts in sets]
    outs = msm_multi(curve, scal, plist, window_bits=4, n_bits=15)
    for pts, out in zip(sets, outs):
        assert jac.to_affine_ints(curve, out) == ref.msm(curve, ks, pts)
