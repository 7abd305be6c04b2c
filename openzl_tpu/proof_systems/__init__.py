"""Proof-system backends (the reference's plugin layer, SURVEY.md section 2.5).

`Groth16` implements the `ProofSystem` lifecycle of the reference
(openzl-crypto/src/constraint.rs:31-87: compile / prove / verify) over the
TPU-native R1CS compiler, NTT, and MSM kernels.
"""

from .groth16 import Groth16, Proof, ProvingKey, VerifyingKey
from .kzg import KZG, KZGParams

__all__ = ["Groth16", "KZG", "KZGParams", "Proof", "ProvingKey", "VerifyingKey"]
