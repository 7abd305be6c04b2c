"""Batched Poseidon permutation over limb-decomposed fields (JAX compute path).

TPU-first design: the permutation is evaluated for a whole batch of states at
once — state tensor shape ``(n_limbs, width, batch)`` with the batch on the
trailing (lane) axis. Rounds run under ``lax.scan`` over per-round constants
so the traced graph holds one full-round body and one partial-round body
instead of 63 unrolled rounds.

Round structure matches the reference bit-exactly
(openzl-crypto/src/poseidon/mod.rs:193-283): add round keys, S-box (all lanes
in full rounds, lane 0 in partial rounds), then MDS. Hashing enters with
state = [domain_tag, *inputs] and returns lane 0
(openzl-crypto/src/poseidon/hash.rs:95-135).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax.numpy as jnp
from jax import lax

from ...fields import limb
from ...fields.spec import FieldSpec
from . import param_gen

#: Secure round numbers at 128-bit security for ~255-bit moduli, alpha=5.
#: (reference: plugins/arkworks/src/poseidon/mod.rs:300-322 and
#: openzl-crypto/src/poseidon/constants.rs known-values table)
ROUND_NUMBERS = {
    2: (8, 55),
    3: (8, 55),
    4: (8, 55),
    5: (8, 56),
    6: (8, 56),
    9: (8, 57),
    17: (8, 59),
}


@dataclasses.dataclass(frozen=True, eq=False)
class Poseidon:
    """Poseidon permutation instance with device-resident Montgomery params.

    `eq=False`: instances hash/compare by identity so they can be jit static
    arguments (`create` is lru_cached, so equal configs share one instance).
    """

    spec: FieldSpec
    width: int
    full_rounds: int
    partial_rounds: int
    round_keys: np.ndarray  # (rounds, n_limbs, width) uint32, Montgomery form
    mds: np.ndarray  # (n_limbs, width, width) uint32, Montgomery form

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds

    @property
    def arity(self) -> int:
        return self.width - 1

    @classmethod
    @functools.lru_cache(maxsize=None)
    def create(
        cls,
        spec: FieldSpec,
        arity: int,
        full_rounds: int | None = None,
        partial_rounds: int | None = None,
    ) -> "Poseidon":
        width = arity + 1
        if full_rounds is None or partial_rounds is None:
            full_rounds, partial_rounds = ROUND_NUMBERS[width]
        keys = param_gen.generate_round_constants(
            spec, width, full_rounds, partial_rounds
        )
        mds = param_gen.generate_mds(spec, width)
        rounds = full_rounds + partial_rounds
        keys_arr = limb.pack_mont(
            spec, np.array(keys, dtype=object).reshape(rounds, width)
        )  # (n, rounds, width)
        keys_arr = np.moveaxis(keys_arr, 0, 1)  # (rounds, n, width)
        mds_arr = limb.pack_mont(spec, np.array(mds, dtype=object))  # (n, w, w)
        return cls(spec, width, full_rounds, partial_rounds, keys_arr, mds_arr)

    # ------------------------------------------------------------------
    # round pieces (state: (n, width, batch) canonical Montgomery limbs)
    # ------------------------------------------------------------------

    def _mds_mul(self, state: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        mds = jnp.asarray(self.mds)[..., None]  # (n, w, w, 1)
        prod = limb.mont_mul(spec, state[:, None], mds)  # (n, w, w, batch)
        acc = prod[:, :, 0]
        for j in range(1, self.width):
            acc = limb.add(spec, acc, prod[:, :, j])
        return acc

    def _add_keys(self, state: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
        return limb.add(self.spec, state, keys[..., None])

    def _full_round(self, state: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
        state = self._add_keys(state, keys)
        state = limb.mont_pow5(self.spec, state)
        return self._mds_mul(state), None

    def _partial_round(self, state: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
        state = self._add_keys(state, keys)
        head = limb.mont_pow5(self.spec, state[:, :1])
        state = jnp.concatenate([head, state[:, 1:]], axis=1)
        return self._mds_mul(state), None

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def permute(self, state: jnp.ndarray) -> jnp.ndarray:
        """Apply the permutation to a batch of Montgomery-form states.

        state: (n_limbs, width, *batch) -> same shape.
        """
        squeeze = state.ndim == 2
        if squeeze:
            state = state[..., None]
        batch = state.shape[2:]
        state = state.reshape(state.shape[:2] + (-1,))

        keys = jnp.asarray(self.round_keys)
        half = self.full_rounds // 2
        mid = half + self.partial_rounds
        state, _ = lax.scan(self._full_round, state, keys[:half])
        state, _ = lax.scan(self._partial_round, state, keys[half:mid])
        state, _ = lax.scan(self._full_round, state, keys[mid:])

        state = state.reshape(state.shape[:2] + batch)
        return state[..., 0] if squeeze else state

    def domain_tag_mont(self) -> np.ndarray:
        """2^arity - 1 in Montgomery limb form, shape (n_limbs,)."""
        return limb.pack_mont(self.spec, (1 << self.arity) - 1)

    def hash_untruncated(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (n_limbs, arity, *batch) Montgomery form -> full final state."""
        squeeze = inputs.ndim == 2
        if squeeze:
            inputs = inputs[..., None]
        batch = inputs.shape[2:]
        tag = jnp.broadcast_to(
            jnp.asarray(self.domain_tag_mont()).reshape(
                (self.spec.n_limbs, 1) + (1,) * len(batch)
            ),
            (self.spec.n_limbs, 1) + batch,
        )
        state = jnp.concatenate([tag, inputs], axis=1)
        out = self.permute(state)
        return out[..., 0] if squeeze else out

    def hash(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (n_limbs, arity, *batch) -> (n_limbs, *batch) digest."""
        return self.hash_untruncated(inputs)[:, 0]
