"""openzl_tpu — TPU-native zero-knowledge primitive framework.

Layer map (mirrors the reference's tiers, SURVEY.md section 1):

  utils/ fields/            L1  limb Montgomery arithmetic, codec, rand,
                                checkpoint
  eclair/                   L3  circuit IR: one gadget description under
                                Native / JAX / R1CS compilers
  crypto/                   L4  gadget layer: poseidon (+optimized rounds),
                                poseidon2, merkle (dense/partial/single-path
                                + fork/forest), accumulator, sponge/duplex
                                AEAD, encryption (+hybrid, converters),
                                signature (Schnorr, COM-generic EdSchnorr),
                                in-circuit EC (ec_gadget), key agreement,
                                algebra, password, constraint facade
  curves/ ops/              L0  batched Jacobian curve ops (G1/G2), MSM,
                                NTT, dense polynomial algebra — the
                                arkworks-equivalent math engines
  proof_systems/            L2  Groth16 (compile / prove / verify,
                                mesh-parallel prove), KZG commitments,
                                ratio proofs
  parallel/                 --  mesh + shard_map multi-chip kernels
  plugins/                  --  ed25519 (plugins/dalek equivalent)
  ref/                      --  pure-Python oracles (test/verify path)
"""

__version__ = "0.1.0"
