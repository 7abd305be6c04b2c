"""Optimized Poseidon (derived MDS + compressed constants) vs the naive path.

Covers the machinery of openzl-crypto/src/poseidon/{matrix.rs, mds.rs,
preprocessing.rs}: dense field linalg, derived matrices, sparse
factorization, round-constant compression — and the equality
`permute_optimized == permute` which is the conformance statement for the
whole optimized pipeline (the naive path is itself pinned by the sage golden
vectors in test_poseidon_params.py).
"""

import random

import numpy as np
import pytest

from openzl_tpu.crypto.poseidon import matrix, mds, preprocessing
from openzl_tpu.crypto.poseidon.param_gen import generate_mds
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ref import poseidon as rp

P = BN254_FR.modulus


def rand_matrix(rng, n):
    return [[rng.randrange(P) for _ in range(n)] for _ in range(n)]


class TestMatrix:
    def test_inverse_roundtrip(self):
        rng = random.Random(0)
        for n in (2, 3, 5):
            m = rand_matrix(rng, n)
            inv = matrix.inverse(P, m)
            assert matrix.is_identity(matrix.matmul(P, m, inv))

    def test_singular_returns_none(self):
        m = [[1, 2], [2, 4]]
        assert matrix.inverse(P, m) is None
        assert not matrix.is_invertible(P, m)
        assert matrix.upper_triangular(P, m) is None

    def test_minor(self):
        m = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
        assert matrix.minor(m, 0, 0) == [[5, 6], [8, 9]]
        assert matrix.minor(m, 1, 2) == [[1, 2], [7, 8]]

    def test_row_col_conventions(self):
        rng = random.Random(1)
        m = rand_matrix(rng, 3)
        v = [rng.randrange(P) for _ in range(3)]
        left = matrix.mul_row_vec_at_left(P, m, v)
        right = matrix.mul_col_vec(P, matrix.transpose(m), v)
        assert left == right

    def test_upper_triangular(self):
        rng = random.Random(2)
        m = rand_matrix(rng, 4)
        ut = matrix.upper_triangular(P, m)
        assert all(ut[i][j] == 0 for i in range(4) for j in range(i))

    def test_sparse_round_trip_and_product(self):
        rng = random.Random(3)
        w_hat = [rng.randrange(P) for _ in range(4)]
        v_rest = [rng.randrange(P) for _ in range(3)]
        s = matrix.SparseMatrix(w_hat, v_rest)
        dense = s.to_dense()
        assert matrix.SparseMatrix.from_dense(dense).w_hat == w_hat
        v = [rng.randrange(P) for _ in range(4)]
        assert s.mul_row_vec_at_left(P, v) == matrix.mul_row_vec_at_left(
            P, dense, v
        )


class TestDerivedMds:
    @pytest.mark.parametrize("width", (3, 4, 5))
    def test_derivation_identities(self, width):
        m = generate_mds(BN254_FR, width)
        d = mds.derive_mds_matrices(P, m)
        assert matrix.is_identity(matrix.matmul(P, d.m, d.m_inv))
        assert matrix.is_identity(matrix.matmul(P, d.m_hat, d.m_hat_inv))
        assert d.m_hat == matrix.minor(m, 0, 0)
        # m = m_prime @ m_double_prime (row-at-left composition order)
        assert matrix.matmul(P, d.m_prime, d.m_double_prime) == d.m

    def test_factorization(self):
        width, rounds = 3, 8
        m = generate_mds(BN254_FR, width)
        pre, sparse = mds.factor_to_sparse_matrices(P, m, rounds)
        assert len(sparse) == rounds
        # Folded back together the factors must reproduce M^(rounds+1):
        # pre @ prod(sparse_i) == M applied rounds+1 times (row-at-left).
        acc = pre
        for s in sparse:
            acc = matrix.matmul(P, acc, s.to_dense())
        want = matrix.identity(width)
        for _ in range(rounds + 1):
            want = matrix.matmul(P, want, m)
        assert acc == want


class TestCompressedConstants:
    @pytest.mark.parametrize(
        "spec,width", [(BN254_FR, 3), (BLS12_381_FR, 3), (BN254_FR, 5)]
    )
    def test_optimized_equals_naive(self, spec, width):
        rp_n = {3: 55, 5: 56}[width]
        params = rp.PoseidonParams.generate(spec, width, 8, rp_n)
        opt = rp.OptimizedPoseidonParams.derive(params)
        assert len(opt.compressed_keys) == width * 8 + rp_n
        rng = random.Random(42)
        for _ in range(3):
            st = [rng.randrange(spec.modulus) for _ in range(width)]
            assert rp.permute(params, st) == rp.permute_optimized(opt, st)

    def test_key_count(self):
        params = rp.PoseidonParams.generate(BN254_FR, 3, 8, 55)
        m = [list(params.mds[i * 3 : (i + 1) * 3]) for i in range(3)]
        matrices = mds.derive_mds_matrices(P, m)
        keys = preprocessing.compress_round_constants(
            P, 3, 8, 55, params.round_keys, matrices
        )
        assert len(keys) == 3 * 8 + 55


class TestJaxOptimized:
    def test_permute_optimized_matches_naive(self):
        from openzl_tpu.crypto.poseidon.permutation import Poseidon
        from openzl_tpu.fields import limb

        spec = BN254_FR
        perm = Poseidon.create(spec, arity=2)
        rng = random.Random(7)
        vals = [[rng.randrange(spec.modulus) for _ in range(3)] for _ in range(4)]
        st = limb.pack_mont(spec, np.array(vals, dtype=object).T)
        out_naive = np.asarray(perm.permute(st))
        out_opt = np.asarray(perm.permute_optimized(st))
        assert (out_naive == out_opt).all()
