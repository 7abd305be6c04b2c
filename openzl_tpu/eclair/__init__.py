"""ECLAIR-equivalent circuit layer: one gadget description, many compilers.

The reference's central design (eclair/src/lib.rs:27-84, SURVEY.md section 1)
is a single generic circuit description that executes in any computational
environment selected by the ``COM`` type parameter. The TPU-native analogue:
gadgets are plain Python functions taking a ``com`` object; the three
compilers share one protocol:

  * :class:`NativeCompiler` — host Python-int field arithmetic (the oracle).
  * :class:`JaxCompiler` — batched limb arithmetic on TPU (the compute path).
  * :class:`R1CSCompiler` — records R1CS constraints (the proof path),
    mirroring plugins/arkworks/src/constraint/mod.rs:67-197.

Native and traced semantics are kept identical by running the same gadget
function under every compiler and asserting equal outputs (tests/test_eclair).
"""

from .r1cs import R1CS, LinComb, SynthesisMode
from .compilers import FpVar, JaxCompiler, NativeCompiler, R1CSCompiler
from .measure import Instrument, measure_constraints

__all__ = [
    "R1CS",
    "LinComb",
    "SynthesisMode",
    "FpVar",
    "NativeCompiler",
    "JaxCompiler",
    "R1CSCompiler",
    "Instrument",
    "measure_constraints",
]
