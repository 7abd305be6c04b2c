"""Elliptic-curve arithmetic: TPU-batched Jacobian ops, MSM, and pairings.

TPU-native replacement for the reference's L0 curve engines (ark-ec;
SURVEY.md section 2.8): batched branch-free point arithmetic over the
limb-decomposed base fields, Pippenger MSM as sort + segmented reduction
(no data-dependent scatter in the hot loop), and single-chip pairings for
Groth16 verification.
"""

from .spec import (
    BLS12_377_G1,
    BLS12_377_G2,
    BLS12_381_G1,
    BLS12_381_G2,
    BN254_G1,
    BN254_G2,
    CurveSpec,
    get_curve,
)

__all__ = [
    "CurveSpec",
    "BLS12_377_G1",
    "BLS12_377_G2",
    "BLS12_381_G1",
    "BLS12_381_G2",
    "BN254_G1",
    "BN254_G2",
    "get_curve",
]
