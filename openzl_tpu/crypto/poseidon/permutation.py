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

#: Wire-compatible round numbers (width -> (R_F, R_P)) pinned to the
#: reference's hardcoded arkworks-plugin instances so hashes interoperate
#: (plugins/arkworks/src/poseidon/mod.rs:300-322). Any width NOT listed here
#: falls back to the security search in `constants.from_arity` (which
#: reproduces openzl-crypto/src/poseidon/constants.rs:318-358; note that
#: table differs from the plugin's at a few arities — the plugin's values
#: win for interop).
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
    # Optimized-Poseidon parameters (bit-identical permutation, sparse
    # partial rounds; reference openzl-crypto/src/poseidon/{mds.rs,
    # preprocessing.rs}). All Montgomery uint32.
    opt_initial: np.ndarray  # (n_limbs, width) pre-add before round 0
    opt_full_keys: np.ndarray  # (full_rounds - 1, n_limbs, width) post-sbox
    opt_partial_keys: np.ndarray  # (partial_rounds, n_limbs) post-sbox singles
    opt_pre_sparse: np.ndarray  # (n_limbs, width, width) boundary matrix
    opt_w_hat: np.ndarray  # (partial_rounds, n_limbs, width) sparse 1st cols
    opt_v_rest: np.ndarray  # (partial_rounds, n_limbs, width-1) sparse 1st rows

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
            if width in ROUND_NUMBERS:
                full_rounds, partial_rounds = ROUND_NUMBERS[width]
            else:
                from . import constants as _constants

                found = _constants.from_arity(arity, modulus_bits=spec.bits)
                full_rounds, partial_rounds = (
                    found.full_rounds,
                    found.partial_rounds,
                )
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

        # Derive the optimized (sparse partial round) parameters from the
        # same integer params — cold path, a few ms.
        from . import mds as mds_mod
        from . import preprocessing

        p = spec.modulus
        matrices = mds_mod.derive_mds_matrices(p, mds)
        ckeys = preprocessing.compress_round_constants(
            p, width, full_rounds, partial_rounds, keys, matrices
        )
        pre_sparse, sparse = mds_mod.factor_to_sparse_matrices(
            p, mds, partial_rounds
        )
        half = full_rounds // 2
        obj = lambda x: np.array(x, dtype=object)  # noqa: E731
        initial = limb.pack_mont(spec, obj(ckeys[:width]))
        full_post = [
            ckeys[width * (1 + r) : width * (2 + r)] for r in range(half)
        ]
        pofs = width * (half + 1)
        partial_keys = ckeys[pofs : pofs + partial_rounds]
        fofs = pofs + partial_rounds
        full_post += [
            ckeys[fofs + width * r : fofs + width * (r + 1)]
            for r in range(half - 1)
        ]
        full_keys = np.moveaxis(limb.pack_mont(spec, obj(full_post)), 0, 1)
        partial_arr = np.moveaxis(
            limb.pack_mont(spec, obj(partial_keys)), 0, 1
        )  # (R_P, n)
        pre_sparse_arr = limb.pack_mont(spec, obj(pre_sparse))
        w_hat = np.moveaxis(
            limb.pack_mont(spec, obj([s.w_hat for s in sparse])), 0, 1
        )
        v_rest = np.moveaxis(
            limb.pack_mont(spec, obj([s.v_rest for s in sparse])), 0, 1
        )
        return cls(
            spec, width, full_rounds, partial_rounds, keys_arr, mds_arr,
            initial, full_keys, partial_arr, pre_sparse_arr, w_hat, v_rest,
        )

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
    # optimized rounds (sparse partial layers; bit-identical output)
    # ------------------------------------------------------------------

    def _mat_mul_left(self, mat: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
        """Row-vector-at-left product: out_j = sum_i state_i * mat[i][j].

        The optimized matrices (pre_sparse) are not symmetric, so the
        convention matters; mat shape (n, w, w)."""
        spec = self.spec
        prod = limb.mont_mul(spec, state[:, :, None], mat[..., None])
        acc = prod[:, 0]
        for i in range(1, self.width):
            acc = limb.add(spec, acc, prod[:, i])
        return acc

    def _opt_full_round(self, state: jnp.ndarray, keys: jnp.ndarray):
        state = limb.mont_pow5(self.spec, state)
        state = self._add_keys(state, keys)
        return self._mds_mul(state), None

    def _opt_partial_round(self, state: jnp.ndarray, xs):
        spec = self.spec
        pk, w_hat, v_rest = xs  # (n,), (n, w), (n, w-1)
        head = limb.mont_pow5(spec, state[:, :1])
        head = limb.add(spec, head, pk[:, None, None])
        state = jnp.concatenate([head, state[:, 1:]], axis=1)
        prod0 = limb.mont_mul(spec, state, w_hat[..., None])  # (n, w, B)
        out0 = prod0[:, 0]
        for j in range(1, self.width):
            out0 = limb.add(spec, out0, prod0[:, j])
        rest = limb.add(
            spec,
            state[:, 1:],
            limb.mont_mul(spec, state[:, :1], v_rest[..., None]),
        )
        return jnp.concatenate([out0[:, None], rest], axis=1), None

    def permute_optimized(self, state: jnp.ndarray) -> jnp.ndarray:
        """Optimized permutation (post-sbox compressed constants, sparse
        partial rounds); bit-identical to :meth:`permute`.

        Reference: the runtime consuming openzl-crypto/src/poseidon/
        {preprocessing.rs,mds.rs} output (filecoin-neptune's
        hash_optimized round flow). Partial rounds cost 2w-1 muls vs w^2."""
        spec = self.spec
        squeeze = state.ndim == 2
        if squeeze:
            state = state[..., None]
        batch = state.shape[2:]
        state = state.reshape(state.shape[:2] + (-1,))

        half = self.full_rounds // 2
        full_keys = jnp.asarray(self.opt_full_keys)
        state = self._add_keys(state, jnp.asarray(self.opt_initial))
        # first half full rounds: dense MDS, then the pre-sparse boundary
        state, _ = lax.scan(self._opt_full_round, state, full_keys[: half - 1])
        state = limb.mont_pow5(spec, state)
        state = self._add_keys(state, full_keys[half - 1])
        state = self._mat_mul_left(jnp.asarray(self.opt_pre_sparse), state)
        # partial rounds: single post-sbox key + sparse product
        state, _ = lax.scan(
            self._opt_partial_round,
            state,
            (
                jnp.asarray(self.opt_partial_keys),
                jnp.asarray(self.opt_w_hat),
                jnp.asarray(self.opt_v_rest),
            ),
        )
        # last half full rounds; the final round adds no constants
        state, _ = lax.scan(self._opt_full_round, state, full_keys[half:])
        state = limb.mont_pow5(spec, state)
        state = self._mds_mul(state)

        state = state.reshape(state.shape[:2] + batch)
        return state[..., 0] if squeeze else state

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
