"""Proof-system facade (reference openzl-crypto/src/constraint.rs:31-119).

`ProofSystem` is the compile/prove/verify lifecycle trait; `Input` is the
public-input builder that flattens heterogeneous values into the prover's
field-element vector (constraint.rs:90-119, plugins/arkworks/src/groth16.rs:
470-487 `HasInput` impls). `verify_fuzz_public_input` is the reusable
negative test (constraint.rs:384-405)."""

from __future__ import annotations

from typing import Callable, List, Protocol, Sequence


class ProofSystem(Protocol):
    """compile(cs, rng) -> pk; prove(pk, cs, rng) -> proof;
    verify(vk, input, proof) -> bool."""

    def context_compiler(self): ...

    def proof_compiler(self): ...

    def compile(self, cs, rng): ...

    def prove(self, pk, cs, rng): ...

    def verify(self, vk, public_input, proof) -> bool: ...


class InputBuilder:
    """Flattens values into the public-input vector (reference `Input<P>`)."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.values: List[int] = []

    def extend_field(self, x: int) -> "InputBuilder":
        self.values.append(x % self.modulus)
        return self

    def extend_bool(self, b: bool) -> "InputBuilder":
        self.values.append(1 if b else 0)
        return self

    def extend_uint(self, x: int) -> "InputBuilder":
        assert x >= 0
        self.values.append(x % self.modulus)
        return self

    def extend_digest(self, limbs_int: int) -> "InputBuilder":
        return self.extend_field(limbs_int)

    def extend_all(self, xs: Sequence[int]) -> "InputBuilder":
        for x in xs:
            self.extend_field(x)
        return self

    def build(self) -> List[int]:
        return list(self.values)


def verify_fuzz_public_input(
    proof_system,
    vk,
    public_input: Sequence[int],
    proof,
    fuzz: Callable[[List[int]], List[int]],
    rounds: int = 8,
) -> bool:
    """True iff the genuine input verifies AND every fuzzed variant fails
    (reference constraint.rs:384-405 + rand.rs fuzz framework)."""
    if not proof_system.verify(vk, list(public_input), proof):
        return False
    for _ in range(rounds):
        mutated = fuzz(list(public_input))
        if mutated == list(public_input):
            continue
        if proof_system.verify(vk, mutated, proof):
            return False
    return True
