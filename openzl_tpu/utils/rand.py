"""Sampling and fuzzing utilities (reference openzl-util/src/rand.rs).

`Sample`-style distribution helpers for field elements, scalars, and curve
points, plus the `Fuzz` mutation helpers used by negative tests
(rand.rs:529-590)."""

from __future__ import annotations

import random
from typing import List, Sequence

from ..curves.spec import CurveSpec
from ..fields.spec import FieldSpec


def sample_field(spec: FieldSpec, rng: random.Random) -> int:
    return rng.randrange(spec.modulus)


def sample_field_vec(spec: FieldSpec, rng: random.Random, n: int) -> List[int]:
    return [rng.randrange(spec.modulus) for _ in range(n)]


def sample_scalar(curve: CurveSpec, rng: random.Random) -> int:
    return rng.randrange(1, curve.scalar.modulus)


def sample_point(curve: CurveSpec, rng: random.Random):
    from ..ref import curve as refc

    return refc.scalar_mul(curve, sample_scalar(curve, rng), refc.generator(curve))


class SeedRng(random.Random):
    """Deterministic rng from an integer seed (reference SeedIntoRng)."""


def fuzz_field(spec: FieldSpec, x: int, rng: random.Random) -> int:
    """Mutate a field element into a different one (reference Fuzz)."""
    delta = rng.randrange(1, spec.modulus)
    return (x + delta) % spec.modulus


def fuzz_vector(spec: FieldSpec, xs: Sequence[int], rng: random.Random) -> List[int]:
    """Mutate one random coordinate."""
    out = list(xs)
    if not out:
        return out
    i = rng.randrange(len(out))
    out[i] = fuzz_field(spec, out[i], rng)
    return out
