"""Plugin-layer equivalents (reference plugins/; SURVEY.md sections 2.5-2.6).

The arkworks plugin's role (R1CS compiler, Groth16, Poseidon backend) is
native to this framework (openzl_tpu.eclair / proof_systems); this package
holds the remaining plugin parity items, e.g. the dalek-equivalent ed25519.
"""
