"""Device sparse field matvec vs python-int oracle (prover hot path)."""

import random

import numpy as np
import pytest

from openzl_tpu.eclair.r1cs import LinComb
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops.sparse import SparseFieldMatrix

P = BN254_FR.modulus


def naive_matvec(rows, z, p, n_rows):
    out = [0] * n_rows
    for r, lc in enumerate(rows):
        out[r] = sum(c * z[i] for i, c in lc.terms.items()) % p
    return out


@pytest.mark.parametrize("spec", (BN254_FR, BLS12_381_FR))
def test_matvec_matches_oracle(spec):
    p = spec.modulus
    rng = random.Random(11)
    n_cols, n_rows = 23, 17
    rows = []
    for _ in range(n_rows):
        lc = LinComb(
            {
                rng.randrange(n_cols): rng.randrange(p)
                for _ in range(rng.randrange(0, 6))
            }
        )
        rows.append(lc)
    z = [rng.randrange(p) for _ in range(n_cols)]
    m = SparseFieldMatrix.from_lincombs(spec, rows, n_rows, n_cols)
    z_mont = limb.pack_mont(spec, np.array(z, dtype=object))
    got = limb.unpack_mont(spec, np.asarray(m.matvec(z_mont)))
    assert [int(x) for x in got] == naive_matvec(rows, z, p, n_rows)


def test_matvec_padded_rows_are_zero():
    # n_rows larger than the last touched row: untouched rows stay 0
    spec = BN254_FR
    rows = [LinComb({0: 5}), LinComb(), LinComb({1: 3})]
    m = SparseFieldMatrix.from_lincombs(spec, rows, 8, 4)
    z = [2, 7, 0, 0]
    z_mont = limb.pack_mont(spec, np.array(z, dtype=object))
    got = [int(x) for x in limb.unpack_mont(spec, np.asarray(m.matvec(z_mont)))]
    assert got == [10, 0, 21, 0, 0, 0, 0, 0]


def test_transpose_matvec_is_column_eval():
    spec = BN254_FR
    rng = random.Random(5)
    rows = [
        LinComb({rng.randrange(6): rng.randrange(P) for _ in range(3)})
        for _ in range(9)
    ]
    m = SparseFieldMatrix.from_lincombs(spec, rows, 9, 6)
    t = m.transpose()
    lag = [rng.randrange(P) for _ in range(9)]
    lag_mont = limb.pack_mont(spec, np.array(lag, dtype=object))
    got = [int(x) for x in limb.unpack_mont(spec, np.asarray(t.matvec(lag_mont)))]
    want = [0] * 6
    for j, lc in enumerate(rows):
        for k, c in lc.terms.items():
            want[k] = (want[k] + c * lag[j]) % P
    assert got == want


def test_empty_matrix():
    spec = BN254_FR
    m = SparseFieldMatrix.from_lincombs(spec, [], 4, 4)
    z_mont = limb.pack_mont(spec, np.array([1, 2, 3, 4], dtype=object))
    got = [int(x) for x in limb.unpack_mont(spec, np.asarray(m.matvec(z_mont)))]
    assert got == [0, 0, 0, 0]
