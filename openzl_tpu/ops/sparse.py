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
from ..utils.aot_cache import aot_jit


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
    # device-buffer cache (rows/cols/vals lifted once, freed on demand so
    # the 2^20-constraint prover can stage HBM residency)
    _dev: dict = dataclasses.field(default_factory=dict, compare=False)

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    @classmethod
    def from_lincombs(
        cls, spec: FieldSpec, lincombs: Sequence, n_rows: int, n_cols: int
    ) -> "SparseFieldMatrix":
        """Build from a list of LinComb rows (eclair.r1cs).

        Coefficients are INTERNED: circuits reuse a small pool of distinct
        constants (gadget round constants, +/-1, powers of two), so the
        bigint -> Montgomery-limb conversion runs once per distinct value
        and the (n_limbs, nnz) table is a numpy gather — the difference
        between seconds and minutes at nnz = 2^23 (the 2^20-constraint
        prover's per-element Python packing was the dominant setup cost,
        VERDICT r4 weak item 2)."""
        rows: List[int] = []
        cols: List[int] = []
        ids: List[int] = []
        interned: dict = {}
        distinct: List[int] = []
        for r, lc in enumerate(lincombs):
            for k, coeff in lc.terms.items():
                i = interned.get(coeff)
                if i is None:
                    i = len(distinct)
                    interned[coeff] = i
                    distinct.append(coeff)
                rows.append(r)
                cols.append(k)
                ids.append(i)
        if not rows:
            rows, cols, ids, distinct = [0], [0], [0], [0]
        p = spec.modulus
        pool = limb.pack_mont(
            spec, np.array([c % p for c in distinct], dtype=object)
        )
        r = np.asarray(rows, dtype=np.int32)
        c = np.asarray(cols, dtype=np.int32)
        v_ids = np.asarray(ids, dtype=np.int32)
        order = np.argsort(r, kind="stable")
        r, c, v_ids = r[order], c[order], v_ids[order]
        nnz = len(r)
        padded = 1 << (nnz - 1).bit_length()
        if padded != nnz:
            k = padded - nnz
            zero_id = interned.get(0)
            if zero_id is None:
                zero_id = pool.shape[1]
                pool = np.concatenate(
                    [pool, np.zeros((spec.n_limbs, 1), np.uint32)], axis=1
                )
            r = np.concatenate([r, np.full(k, n_rows, dtype=np.int32)])
            c = np.concatenate([c, np.zeros(k, dtype=np.int32)])
            v_ids = np.concatenate([v_ids, np.full(k, zero_id, np.int32)])
        return cls(spec, n_rows, n_cols, r, c, pool[:, v_ids])

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

    def device_buffers(self):
        """Device-resident (rows, cols, vals), lifted once and cached —
        matvec used to re-transfer the full COO every call (512 MB of
        Montgomery values at nnz = 2^23), which dominated the prove
        matvec stage through the ~300 MB/s relay."""
        if "bufs" not in self._dev:
            self._dev["bufs"] = tuple(
                jax.device_put(v) for v in (self.rows, self.cols, self.vals)
            )
        return self._dev["bufs"]

    def drop_device(self) -> None:
        """Free the cached device buffers (HBM staging for the flagship-
        size prover; the host numpy arrays remain)."""
        for buf in self._dev.pop("bufs", ()):
            try:
                buf.delete()
            except Exception:
                pass

    def matvec(self, z_mont: jnp.ndarray) -> jnp.ndarray:
        """(self @ z) mod p: z_mont (n_limbs, n_cols) Montgomery ->
        (n_limbs, n_rows) Montgomery."""
        rows, cols, vals = self.device_buffers()
        return _matvec_jit(
            self.spec, self.n_rows, rows, cols, vals, z_mont,
        )


@functools.partial(aot_jit, static_argnums=(0, 1))
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
