"""Fused NTT butterfly / pointwise-mul Pallas kernels vs the limb oracle.

Interpret mode executes the identical kernel trace on CPU (the Mosaic
compile runs only on real TPU; tools/verify_drive*.py covers that), pinning
down the in-kernel limb arithmetic and the pad/flatten plumbing. The toy
31-bit field keeps interpret-mode graphs small; one BN254 case checks a
production limb count.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openzl_tpu.curves.spec import toy_curve
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BN254_FR, FieldSpec
from openzl_tpu.ops import ntt_kernel

RNG = np.random.default_rng(0x1117)


def _rand_mont(spec, shape):
    bits = spec.modulus.bit_length() + 16
    vals = np.array(
        [
            int.from_bytes(RNG.bytes(bits // 8), "little") % spec.modulus
            for _ in range(int(np.prod(shape)))
        ],
        dtype=object,
    ).reshape(shape)
    return jnp.asarray(limb.pack_mont(spec, vals)), vals


@pytest.mark.parametrize("n", [5, 257])  # force pad paths
def test_butterfly_matches_limb_oracle(n):
    spec = toy_curve().base
    u, uv = _rand_mont(spec, (n,))
    t, tv = _rand_mont(spec, (n,))
    w, wv = _rand_mont(spec, (n,))
    lo, hi = ntt_kernel.butterfly(spec, u, t, w, interpret=True)
    p = spec.modulus
    want_lo = (uv + tv) % p
    want_hi = (uv - tv) * wv % p
    assert (limb.unpack_mont(spec, np.asarray(lo)) == want_lo).all()
    assert (limb.unpack_mont(spec, np.asarray(hi)) == want_hi).all()


def test_mul_and_scale_match(n=33):
    spec = toy_curve().base
    a, av = _rand_mont(spec, (n,))
    b, bv = _rand_mont(spec, (n,))
    p = spec.modulus
    o = ntt_kernel.mont_mul(spec, a, b, interpret=True)
    assert (limb.unpack_mont(spec, np.asarray(o)) == av * bv % p).all()
    s, sv = _rand_mont(spec, (1,))
    o = ntt_kernel.mont_scale(spec, a, s[:, 0], interpret=True)
    assert (limb.unpack_mont(spec, np.asarray(o)) == av * sv[0] % p).all()


@pytest.mark.heavy  # ~2.5 min: 16-limb interpret-mode mont_mul on a full tile
def test_butterfly_bn254_full_width():
    spec = BN254_FR
    n = 7
    u, uv = _rand_mont(spec, (n,))
    t, tv = _rand_mont(spec, (n,))
    w, wv = _rand_mont(spec, (n,))
    lo, hi = ntt_kernel.butterfly(spec, u, t, w, interpret=True)
    p = spec.modulus
    assert (limb.unpack_mont(spec, np.asarray(lo)) == (uv + tv) % p).all()
    assert (
        limb.unpack_mont(spec, np.asarray(hi)) == (uv - tv) * wv % p
    ).all()


BABYBEAR = FieldSpec(name="babybear", modulus=2013265921)


@pytest.mark.parametrize("n,m_max", [(64, 8), (512, 8), (1024, 32)])
def test_fourstep_matches_per_stage(n, m_max):
    """Full four-step machinery (fused DIF kernel in interpret mode, level
    twiddles, transposes, composed digit-reversal) vs the per-stage path.

    BabyBear (31-bit, 2-adicity 27) keeps interpret-mode montmuls cheap;
    production widths are covered on real TPU by tools/verify_ntt_kernel.py.
    """
    spec = BABYBEAR
    rng = np.random.default_rng(n)
    vals = np.array(
        [int(rng.integers(0, spec.modulus)) for _ in range(n)], dtype=object
    )
    x = jnp.asarray(limb.pack_mont(spec, vals))
    from openzl_tpu.ops import ntt as nttmod

    want = np.asarray(nttmod._ntt_core(spec, x, False))
    got = np.asarray(
        nttmod.fourstep_transform(spec, x, False, m_max=m_max, interpret=True)
    )
    assert (want == got).all()
    wanti = np.asarray(nttmod._ntt_core(spec, x, True))
    goti = np.asarray(
        nttmod.fourstep_transform(spec, x, True, m_max=m_max, interpret=True)
    )
    assert (wanti == goti).all()


def test_fourstep_batch_dims():
    spec = BABYBEAR
    rng = np.random.default_rng(5)
    n, b = 64, 3
    vals = np.array(
        [int(rng.integers(0, spec.modulus)) for _ in range(n * b)],
        dtype=object,
    ).reshape(n, b)
    x = jnp.asarray(limb.pack_mont(spec, vals))
    from openzl_tpu.ops import ntt as nttmod

    want = np.asarray(nttmod._ntt_core(spec, x, False))
    got = np.asarray(
        nttmod.fourstep_transform(spec, x, False, m_max=8, interpret=True)
    )
    assert (want == got).all()


def test_butterfly_batch_dims():
    spec = toy_curve().base
    u, uv = _rand_mont(spec, (4, 3))
    t, tv = _rand_mont(spec, (4, 3))
    w, wv = _rand_mont(spec, (4, 3))
    lo, hi = ntt_kernel.butterfly(spec, u, t, w, interpret=True)
    p = spec.modulus
    assert (limb.unpack_mont(spec, np.asarray(lo)) == (uv + tv) % p).all()
    assert (
        limb.unpack_mont(spec, np.asarray(hi)) == (uv - tv) * wv % p
    ).all()
