"""Poseidon parameter generation and oracle permutation vs sage golden vectors."""

import json
import pathlib

import pytest

from openzl_tpu.crypto.poseidon.param_gen import (
    generate_lfsr,
    generate_mds,
    sample_field_element,
)
from openzl_tpu.fields.spec import BLS12_381_FR
from openzl_tpu.ref import poseidon as ref_poseidon

VECTORS = pathlib.Path(__file__).parent / "vectors"


def load(name):
    with open(VECTORS / name) as f:
        return json.load(f)


def test_lfsr_golden():
    golden = [int(v) for v in load("poseidon_lfsr_bls381.json")["values"]]
    lfsr = generate_lfsr(255, 3, 8, 55)
    got = [sample_field_element(lfsr, BLS12_381_FR) for _ in golden]
    assert got == golden


@pytest.mark.parametrize("width", range(2, 13))
def test_mds_golden(width):
    golden = [int(v) for v in load("poseidon_mds_bls381.json")["matrices"][str(width)]]
    got = [x for row in generate_mds(BLS12_381_FR, width) for x in row]
    assert got == golden


def test_permutation_golden():
    vec = load("poseidon_perm_width3_bls381.json")
    params = ref_poseidon.PoseidonParams.generate(BLS12_381_FR, 3, 8, 55)
    got = ref_poseidon.permute(params, [int(v) for v in vec["input"]])
    assert got == [int(v) for v in vec["output"]]
