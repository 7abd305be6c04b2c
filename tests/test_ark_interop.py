"""arkworks-convention conformance against independently generated fixtures.

`tests/vectors/ark_interop.json` is produced by
`tools/gen_ark_interop_vectors.py` — a standalone pure-int reimplementation
of the arkworks conventions that shares no code with the library (see that
file's docstring for why live arkworks artifacts are not producible here:
no Rust toolchain, no egress). The frozen two-adic roots additionally match
the constants published in the arkworks curve configs (ark-bn254/ark-bls12-381
`fr.rs`), so agreement here is a real two-implementation cross-check of:

  * NTT domain derivation vs ark-poly Radix2EvaluationDomain
    (reference consumes these through ark-poly; SURVEY.md section 2.8)
  * point/field serialization vs ark-serialize SW flag layout
    (reference plugins/arkworks/src/serialize.rs:21-141)

BASELINE.md config 5 (cross-artifact verification) is covered to the extent
this environment allows; the JSON schema is shaped so real arkworks-emitted
artifacts can be dropped in without changing this test.
"""

import json
import pathlib

import numpy as np

from openzl_tpu.curves import BLS12_381_G1, BLS12_381_G2, BN254_G1
from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR, BN254_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.utils import codec

VEC = json.loads(
    (pathlib.Path(__file__).parent / "vectors/ark_interop.json").read_text()
)

SPECS = {"bn254_fr": BN254_FR, "bls12_381_fr": BLS12_381_FR}
CURVES = {"bn254_g1": BN254_G1, "bls12_381_g1": BLS12_381_G1}


def test_fr_domain_config_matches_ark():
    for name, cfg in VEC["fr_configs"].items():
        spec = SPECS[name]
        assert nttmod.two_adicity(spec) == cfg["two_adicity"]
        assert nttmod.GENERATORS[name] == cfg["generator"]
        root = nttmod.group_gen(spec, cfg["two_adicity"])
        assert root == int(cfg["two_adic_root_of_unity"])


def test_ntt_matches_ark_poly_evaluations():
    spec = BLS12_381_FR
    for key, case in VEC["ntt"].items():
        log_n = int(key.rsplit("^", 1)[1])
        assert nttmod.group_gen(spec, log_n) == int(case["root_of_unity"])
        coeffs = np.array([int(c) for c in case["coeffs"]], dtype=object)
        got = limb.unpack(
            spec, np.asarray(nttmod.ntt(spec, limb.pack(spec, coeffs)))
        )
        assert [int(x) for x in got] == [int(e) for e in case["evals"]]


def test_g1_point_encodings_match_ark_serialize():
    for name, case in VEC["points"].items():
        if name not in CURVES:
            continue
        curve = CURVES[name]
        gen = (curve.gen_x, curve.gen_y)
        comp = bytes.fromhex(case["generator_compressed"])
        assert codec.point_to_bytes(curve, gen) == comp
        assert codec.point_from_bytes(curve, comp) == gen
        assert codec.point_to_bytes(curve, gen, compressed=False) == (
            bytes.fromhex(case["generator_uncompressed"])
        )
        ident = bytes.fromhex(case["identity_compressed"])
        assert codec.point_to_bytes(curve, None) == ident
        assert codec.point_from_bytes(curve, ident) is None
        neg = bytes.fromhex(case["neg_generator_compressed"])
        q = curve.base.modulus
        assert codec.point_to_bytes(curve, (curve.gen_x, q - curve.gen_y)) == neg
        assert codec.point_from_bytes(curve, neg) == (
            curve.gen_x,
            q - curve.gen_y,
        )


def test_g2_point_encodings_match_ark_serialize():
    curve = BLS12_381_G2
    case = VEC["points"]["bls12_381_g2"]
    gen = (curve.gen_x, curve.gen_y)
    comp = bytes.fromhex(case["generator_compressed"])
    assert codec.point_to_bytes(curve, gen) == comp
    assert codec.point_from_bytes(curve, comp) == gen
    assert codec.point_from_bytes(
        curve, bytes.fromhex(case["identity_compressed"])
    ) is None
    q = curve.base.modulus
    neg_y = (q - curve.gen_y[0], q - curve.gen_y[1])
    neg = bytes.fromhex(case["neg_generator_compressed"])
    assert codec.point_to_bytes(curve, (curve.gen_x, neg_y)) == neg
    assert codec.point_from_bytes(curve, neg) == (curve.gen_x, neg_y)


def test_vec_fr_layout_matches_ark():
    case = VEC["vec_fr_bn254"]
    vals = [int(v) for v in case["values"]]
    w = codec.Writer()
    w.vec(vals, lambda v: w.field(BN254_FR, v))
    assert w.getvalue() == bytes.fromhex(case["bytes"])
    r = codec.Reader(bytes.fromhex(case["bytes"]))
    assert r.vec(lambda: r.field(BN254_FR)) == vals
