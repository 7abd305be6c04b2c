"""Poseidon2: matrix security search, oracle/jnp agreement, hashing.

Poseidon2 has no counterpart in the reference (openzl implements classic
Poseidon only); it is the TPU-first high-throughput permutation. The
conformance chain is: python-int oracle (permute_ints) -> jnp path
(Poseidon2.permute) -> Pallas kernel (ops/poseidon2_kernel, exercised in
interpret mode here and on real TPU in the heavy suite).
"""

import random

import numpy as np
import pytest

from openzl_tpu.crypto import poseidon2 as p2
from openzl_tpu.crypto.poseidon.matrix import matmul
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR


class TestMatrices:
    def test_external_small_widths(self):
        assert p2.external_matrix(2) == [[2, 1], [1, 2]]
        assert p2.external_matrix(3) == [[2, 1, 1], [1, 2, 1], [1, 1, 2]]

    def test_external_t4_blocks(self):
        me = p2.external_matrix(4)
        assert me[0][:4] == [10, 14, 2, 6]  # 2 * M4 row 0

    def test_external_t8_circulant(self):
        me = p2.external_matrix(8)
        # diagonal blocks are 2*M4, off-diagonal blocks are M4
        assert me[0][0] == 10 and me[0][4] == 5

    @pytest.mark.parametrize("spec", (BN254_FR, BLS12_381_FR))
    @pytest.mark.parametrize("width", (2, 3, 4))
    def test_internal_diag_is_secure(self, spec, width):
        p = spec.modulus
        diag = p2.internal_matrix(p, width)
        assert len(set(diag)) == width  # distinct entries
        m = [[1] * width for _ in range(width)]
        for i in range(width):
            m[i][i] = 1 + diag[i]
        mk = m
        for _ in range(width):
            assert p2._is_irreducible(p, p2._char_poly(p, mk))
            mk = matmul(p, mk, m)

    def test_repeated_diag_rejected(self):
        # mu_i == mu_j gives the invariant vector e_i - e_j
        p = BN254_FR.modulus
        m = [[2, 1, 1], [1, 2, 1], [1, 1, 3]]
        assert not p2._is_irreducible(p, p2._char_poly(p, m))


class TestCharPoly:
    def test_char_poly_small(self):
        # det(xI - [[2,1],[1,3]]) = x^2 - 5x + 5
        got = p2._char_poly(10007, [[2, 1], [1, 3]])
        assert got == [5, 10007 - 5, 1]

    def test_irreducibility_quadratics(self):
        # x^2 + 1 irreducible over F_7 (-1 is not a QR), reducible over F_5
        assert p2._is_irreducible(7, [1, 0, 1])
        assert not p2._is_irreducible(5, [1, 0, 1])


class TestPermutation:
    @pytest.mark.parametrize(
        "spec,arity", [(BN254_FR, 2), (BLS12_381_FR, 2)]
    )
    def test_jnp_matches_oracle(self, spec, arity):
        perm = p2.Poseidon2.create(spec, arity=arity)
        w = perm.width
        rng = random.Random(3)
        vals = [[rng.randrange(spec.modulus) for _ in range(w)] for _ in range(4)]
        st = limb.pack_mont(spec, np.array(vals, dtype=object).T)
        got = limb.unpack_mont(spec, np.asarray(perm.permute(st)))
        want = np.array(
            [
                p2.permute_ints(
                    spec, w, perm.full_rounds, perm.partial_rounds,
                    perm.ext_keys_int, perm.int_keys_int, v,
                )
                for v in vals
            ],
            dtype=object,
        ).T
        assert (got == want).all()

    def test_round_numbers(self):
        perm = p2.Poseidon2.create(BN254_FR, arity=2)
        assert (perm.full_rounds, perm.partial_rounds) == (8, 56)

    def test_permutation_is_deterministic_and_distinct(self):
        spec = BN254_FR
        perm = p2.Poseidon2.create(spec, arity=2)
        a = p2.permute_ints(
            spec, 3, perm.full_rounds, perm.partial_rounds,
            perm.ext_keys_int, perm.int_keys_int, [3, 1, 2],
        )
        b = p2.permute_ints(
            spec, 3, perm.full_rounds, perm.partial_rounds,
            perm.ext_keys_int, perm.int_keys_int, [3, 1, 2],
        )
        assert a == b and a != [3, 1, 2]

    def test_hash_truncates_lane0_with_domain_tag(self):
        spec = BN254_FR
        perm = p2.Poseidon2.create(spec, arity=2)
        rng = random.Random(5)
        vals = [rng.randrange(spec.modulus) for _ in range(2)]
        inputs = limb.pack_mont(spec, np.array(vals, dtype=object)[:, None])
        digest = limb.unpack_mont(spec, np.asarray(perm.hash(inputs[:, :, 0])))
        tag = (1 << 2) - 1
        want = p2.permute_ints(
            spec, 3, perm.full_rounds, perm.partial_rounds,
            perm.ext_keys_int, perm.int_keys_int, [tag, *vals],
        )[0]
        assert int(digest) == want
