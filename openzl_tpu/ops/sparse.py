"""Device-resident sparse field matrices (COO) with segmented-scan matvec.

Replaces the prover's Python dict-loop hot paths (`LinComb.eval` row dots and
QAP column evaluations) with one TPU pass: gather assignment entries by
column, Montgomery-multiply by the stored coefficients, and segment-sum along
the sorted row index with a log-depth modular scan. The expensive
python-int -> limb conversion of the MATRIX happens once at construction and
is cached inside the proving pipeline; per-prove work is O(num_vars) packing
plus the device matvec.

Role in the reference architecture: this is the ark-relations constraint
matrix + ark-groth16 witness-map evaluation equivalent (SURVEY.md section
3.2 "synthesize witness vector" / R1CS-to-QAP; plugins/arkworks/src/
constraint/mod.rs:179-197 hands the matrices to arkworks' prover, whose
evaluations rayon-parallelize — here they vectorize over the TPU batch axis
instead).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import FieldSpec
from .ntt import _use_kernel
from .scan_utils import segmented_scan


@dataclasses.dataclass(frozen=True, eq=False)
class SparseFieldMatrix:
    """COO matrix over a prime field, rows sorted ascending, Montgomery vals.

    eq=False / identity-hash so instances can be jit static args.
    """

    spec: FieldSpec
    n_rows: int
    n_cols: int
    rows: np.ndarray  # (nnz,) int32, sorted ascending
    cols: np.ndarray  # (nnz,) int32
    vals: np.ndarray  # (n_limbs, nnz) uint32, Montgomery form

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    @classmethod
    def from_lincombs(
        cls, spec: FieldSpec, lincombs: Sequence, n_rows: int, n_cols: int
    ) -> "SparseFieldMatrix":
        """Build from a list of LinComb rows (eclair.r1cs)."""
        rows: List[int] = []
        cols: List[int] = []
        ints: List[int] = []
        for r, lc in enumerate(lincombs):
            for k, coeff in lc.terms.items():
                rows.append(r)
                cols.append(k)
                ints.append(coeff)
        return cls.from_coo(spec, rows, cols, ints, n_rows, n_cols)

    @classmethod
    def from_coo(
        cls,
        spec: FieldSpec,
        rows: Sequence[int],
        cols: Sequence[int],
        ints: Sequence[int],
        n_rows: int,
        n_cols: int,
    ) -> "SparseFieldMatrix":
        if len(rows) == 0:
            rows, cols, ints = [0], [0], [0]  # keep shapes static
        r = np.asarray(rows, dtype=np.int32)
        c = np.asarray(cols, dtype=np.int32)
        v = np.array(ints, dtype=object)
        order = np.argsort(r, kind="stable")
        r, c, v = r[order], c[order], v[order]
        # Pad nnz to a power of two so the segmented matvec scan takes the
        # work-efficient chunked path (scan_utils requires divisibility).
        # Padding: zero coefficients in virtual row `n_rows` — sorted last,
        # summed into the scatter dump slot; after `transpose` they become
        # zero-coefficient terms whose gathered operand is clipped in-range,
        # still contributing exactly nothing.
        nnz = len(r)
        padded = 1 << (nnz - 1).bit_length()
        if padded != nnz:
            k = padded - nnz
            r = np.concatenate([r, np.full(k, n_rows, dtype=np.int32)])
            c = np.concatenate([c, np.zeros(k, dtype=np.int32)])
            v = np.concatenate([v, np.zeros(k, dtype=object)])
        return cls(
            spec, n_rows, n_cols, r, c,
            limb.pack_mont(spec, v % spec.modulus),
        )

    def transpose(self) -> "SparseFieldMatrix":
        """Swapped-axes copy (used for QAP column evaluations)."""
        order = np.argsort(self.cols, kind="stable")
        return SparseFieldMatrix(
            self.spec, self.n_cols, self.n_rows,
            self.cols[order], self.rows[order], self.vals[:, order],
        )

    def matvec(self, z_mont: jnp.ndarray) -> jnp.ndarray:
        """(self @ z) mod p: z_mont (n_limbs, n_cols) Montgomery ->
        (n_limbs, n_rows) Montgomery."""
        return _matvec_jit(
            self.spec, self.n_rows,
            jnp.asarray(self.rows), jnp.asarray(self.cols),
            jnp.asarray(self.vals), z_mont,
        )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _matvec_jit(
    spec: FieldSpec,
    n_rows: int,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    z: jnp.ndarray,
) -> jnp.ndarray:
    gathered = z[:, cols]  # (n, nnz)
    if _use_kernel():
        # fused-VMEM Montgomery product: the XLA limb path materializes
        # O(n_limbs^2 * nnz) partial-product temps, which at nnz = 2^23
        # (the 2^20-constraint prover) alone exceeds the 16 GB chip HBM
        from . import ntt_kernel

        terms = ntt_kernel.mont_mul(spec, vals, gathered)
    else:
        terms = limb.mont_mul(spec, vals, gathered)

    prev = jnp.concatenate([jnp.full((1,), -1, rows.dtype), rows[:-1]])
    starts = rows != prev

    def combine(a, b):
        return (limb.add(spec, a[0], b[0]),)

    def pad(k):
        return (jnp.zeros((spec.n_limbs, k), dtype=jnp.uint32),)

    (scanned,) = segmented_scan(combine, (terms,), starts, pad)

    nxt = jnp.concatenate([rows[1:], jnp.full((1,), -1, rows.dtype)])
    tails = rows != nxt
    slot = jnp.where(tails, rows, n_rows)  # non-tails -> dump slot
    out = jnp.zeros((spec.n_limbs, n_rows + 1), dtype=jnp.uint32)
    out = out.at[:, slot].set(scanned)
    return out[:, :n_rows]
