"""Pallas kernel equivalence tests (heavy: real TPU via
OPENZL_TPU_TEST_BACKEND=axon, or interpret mode on the CPU backend).

Chain: python-int oracle == jnp path (fast suite) == Pallas kernels (here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.crypto.poseidon2 import Poseidon2
from openzl_tpu.fields.spec import BN254_FR
from openzl_tpu.ops import poseidon2_kernel as pk2
from openzl_tpu.ops import poseidon_kernel as pk

pytestmark = pytest.mark.heavy

TILE = 32 * 128


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _rand_state(spec, width, batch):
    rng = np.random.default_rng(7)
    state = rng.integers(0, 1 << 16, size=(spec.n_limbs, width, batch), dtype=np.uint32)
    state[-1] &= 0x3FFF
    return state


def test_classic_kernel_matches_jnp():
    spec = BN254_FR
    perm = Poseidon.create(spec, arity=2)
    state = _rand_state(spec, perm.width, TILE)
    want = np.asarray(perm.permute(state))
    got = np.asarray(pk.permute(perm, jnp.asarray(state), interpret=_interpret()))
    assert (got == want).all()


def test_optimized_kernel_matches_naive_kernel():
    spec = BN254_FR
    perm = Poseidon.create(spec, arity=2)
    state = _rand_state(spec, perm.width, TILE)
    lanes = pk.to_lanes(jnp.asarray(state))
    a = np.asarray(pk.from_lanes(pk.permute_lanes(perm, lanes, interpret=_interpret())))
    b = np.asarray(
        pk.from_lanes(pk.permute_lanes_opt(perm, lanes, interpret=_interpret()))
    )
    assert (a == b).all()


def test_poseidon2_kernel_matches_jnp():
    spec = BN254_FR
    perm = Poseidon2.create(spec, arity=2)
    state = _rand_state(spec, perm.width, TILE)
    want = np.asarray(perm.permute(state))
    got = np.asarray(pk2.permute(perm, jnp.asarray(state), interpret=_interpret()))
    assert (got == want).all()
