"""Secure round-number search vs the reference's known-values table.

Reference: openzl-crypto/src/poseidon/constants.rs:313-359 (the table), the
search at 29-77, and the attack bounds at 175-308.
"""

import pytest

from openzl_tpu.crypto.poseidon import constants as c


@pytest.mark.parametrize("arity", sorted(c.KNOWN_PARTIAL_ROUNDS))
def test_search_matches_known_table(arity):
    found = c.from_arity(arity)
    assert found.full_rounds == 8
    assert found.partial_rounds == c.KNOWN_PARTIAL_ROUNDS[arity]
    assert c.are_secure(found.width, found.full_rounds, found.partial_rounds)
    s = c.strengthened(found)
    assert c.are_secure(s.width, s.full_rounds, s.partial_rounds)


def test_bounds_monotone_in_partial_rounds():
    # more partial rounds never increases the required full rounds
    prev = None
    for rp in range(4, 80):
        b = c.full_rounds_lower_bound(3.0, float(rp), 255.0, 128.0)
        if prev is not None:
            assert b <= prev
        prev = b


def test_statistical_bound_small_field():
    # tiny field relative to the security level forces 10 full rounds
    assert c.statistical_full_rounds_bound(3.0, 0.0, 32.0, 128.0) == 10
    assert c.statistical_full_rounds_bound(3.0, 0.0, 255.0, 128.0) == 6


def test_create_falls_back_to_search():
    # width 8 (arity 7) is not in the wire-compat table; the search supplies
    # round numbers and parameter generation proceeds.
    from openzl_tpu.crypto.poseidon.permutation import ROUND_NUMBERS, Poseidon
    from openzl_tpu.fields.spec import BN254_FR

    assert 8 not in ROUND_NUMBERS
    perm = Poseidon.create(BN254_FR, arity=7)
    assert perm.full_rounds == 8
    assert perm.partial_rounds == c.KNOWN_PARTIAL_ROUNDS[7]
