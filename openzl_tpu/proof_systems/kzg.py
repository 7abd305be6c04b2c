"""KZG (Kate) polynomial commitments over the TPU MSM stack.

Fills the reference's `poly-commit` feature slot (ark-poly-commit's KZG10,
reference plugins/arkworks/Cargo.toml:139-140): commit is a single G1 MSM
of the coefficient vector against the powers-of-tau — exactly the kernel
this framework's Pippenger pipeline is built for — and verify is one
2-pairing product on the host oracle (O(1) per opening).

Scheme (KZG10, non-hiding):
  setup:  powers[i] = tau^i * G1 (device-resident), [tau]G2
  commit: C = sum_i p_i * powers[i]                       (TPU MSM)
  open:   q(x) = (p(x) - p(z)) / (x - z),  W = commit(q)  (TPU MSM)
  verify: e(C - v*G1, H) * e(-W, [tau - z]H) == 1

The witness quotient is built by host synthetic division (O(n) bigint ops
— the serial recurrence q_i = p_{i+1} + z q_{i+1} does not batch; at the
2^20 design point it is a one-second host pass against a multi-second
device MSM). Hiding commitments (ark's gamma_g randomization) are not
implemented: every caller in the reference uses the deterministic form.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..curves import jacobian as jac
from ..curves.jacobian import JPoint
from ..fields import limb
from ..ops.msm import fixed_base_msm, msm
from ..ref import curve as refc
from ..ref import pairing as refpair
from ..ref.pairing import PairingSpec


@dataclasses.dataclass
class KZGParams:
    """Universal (degree-bounded) setup. `powers_g1` is device-resident
    (JPoint batch) unless `host` — then an affine int list."""

    pairing: PairingSpec
    powers_g1: object  # JPoint (device) | List[affine] (host)
    g2_gen: Tuple
    tau_g2: Tuple
    max_degree: int
    host: bool = False

    def to_bytes(self, compressed: bool = False) -> bytes:
        """ark UniversalParams member order: powers_of_g, h, beta_h."""
        from ..utils import codec

        g1, g2 = self.pairing.g1, self.pairing.g2
        pts = (
            list(self.powers_g1)
            if self.host
            else jac.to_affine_ints(g1, self.powers_g1)
        )
        w = codec.Writer()
        w.vec(pts, lambda pt: w.point(g1, pt, compressed))
        w.point(g2, self.g2_gen, compressed)
        w.point(g2, self.tau_g2, compressed)
        return w.getvalue()

    @classmethod
    def from_bytes(
        cls,
        pairing: PairingSpec,
        data: bytes,
        compressed: bool = False,
        validate: bool = True,
    ) -> "KZGParams":
        """`validate` enforces subgroup membership per point (ark
        Validate::Yes); pass False for trusted parameter files."""
        from ..utils import codec

        g1, g2 = pairing.g1, pairing.g2
        r = codec.Reader(data)
        pts = r.vec(lambda: r.point(g1, compressed, validate))
        return cls(
            pairing=pairing,
            powers_g1=pts,
            g2_gen=r.point(g2, compressed),
            tau_g2=r.point(g2, compressed),
            max_degree=len(pts) - 1,
            host=True,
        )


class KZG:
    """backend='device' runs commit MSMs on the TPU kernel pipeline;
    'host' keeps everything on the bigint oracle (tiny degrees, tests);
    'auto' picks device beyond 64 coefficients."""

    def __init__(self, pairing: PairingSpec, backend: str = "auto"):
        assert backend in ("auto", "host", "device")
        self.pairing = pairing
        self.backend = backend
        self.fr = pairing.g1.scalar

    def _use_device(self, n: int) -> bool:
        if self.backend == "auto":
            return n > 64
        return self.backend == "device"

    # -- setup ---------------------------------------------------------------

    def setup(self, max_degree: int, rng) -> KZGParams:
        """Trusted setup: sample tau, encode tau^0..tau^max_degree in G1
        (one batched fixed-base TPU dispatch) and tau in G2."""
        r = self.pairing.r
        tau = rng.randrange(1, r)
        n = max_degree + 1
        pows = [1] * n
        for i in range(1, n):
            pows[i] = pows[i - 1] * tau % r
        g2 = self.pairing.g2
        g2_gen = refc.generator(g2)
        tau_g2 = refc.scalar_mul(g2, tau, g2_gen)
        if self._use_device(n):
            sk = jnp.asarray(limb.pack(self.fr, np.array(pows, dtype=object)))
            powers = fixed_base_msm(self.pairing.g1, sk)
            return KZGParams(
                self.pairing, powers, g2_gen, tau_g2, max_degree, host=False
            )
        g1 = self.pairing.g1
        gen = refc.generator(g1)
        powers = [refc.scalar_mul(g1, k, gen) for k in pows]
        return KZGParams(
            self.pairing, powers, g2_gen, tau_g2, max_degree, host=True
        )

    def device_params(self, params: KZGParams) -> KZGParams:
        """Lift host/deserialized params into device-resident form (the
        analogue of Groth16.device_key)."""
        if not params.host:
            return params
        return dataclasses.replace(
            params,
            powers_g1=jac.from_affine_ints(self.pairing.g1, params.powers_g1),
            host=False,
        )

    # -- commit / open -------------------------------------------------------

    def _msm_prefix(self, params: KZGParams, coeffs: Sequence[int]):
        """MSM of `coeffs` against the first len(coeffs) powers."""
        n = len(coeffs)
        assert n - 1 <= params.max_degree, "degree exceeds setup bound"
        g1 = self.pairing.g1
        if params.host:
            acc = None
            for c, P in zip(coeffs, params.powers_g1):
                if c:
                    acc = refc.add(g1, acc, refc.scalar_mul(g1, c, P))
            return acc
        F = jac.field_ops(g1)
        pts = JPoint(
            *(
                F.slice_batch(v, 0, n)
                for v in (
                    params.powers_g1.x,
                    params.powers_g1.y,
                    params.powers_g1.z,
                )
            )
        )
        sk = jnp.asarray(limb.pack(self.fr, np.array(coeffs, dtype=object)))
        return jac.to_affine_ints(g1, msm(g1, sk, pts))

    def commit(self, params: KZGParams, coeffs: Sequence[int]):
        """C = [p(tau)]G1 for p given by ascending coefficients."""
        r = self.pairing.r
        return self._msm_prefix(params, [c % r for c in coeffs])

    def open(
        self, params: KZGParams, coeffs: Sequence[int], z: int
    ) -> Tuple[int, Optional[Tuple]]:
        """(p(z), witness W = [q(tau)]G1) with q = (p - p(z)) / (x - z).

        Synthetic division runs high-to-low: q_{i} = p_{i+1} + z * q_{i+1};
        the final remainder is exactly p(z)."""
        r = self.pairing.r
        z = z % r
        cs = [c % r for c in coeffs]
        if not cs:  # zero polynomial: p(z) = 0, identity witness
            return 0, None
        q: List[int] = [0] * (len(cs) - 1)
        acc = cs[-1]
        for i in range(len(cs) - 2, -1, -1):
            q[i] = acc
            acc = (cs[i] + acc * z) % r
        v = acc
        if not q:  # constant polynomial: witness is the identity
            return v, None
        return v, self._msm_prefix(params, q)

    def verify(
        self,
        params: KZGParams,
        commitment: Optional[Tuple],
        z: int,
        v: int,
        proof: Optional[Tuple],
    ) -> bool:
        """e(C - v*G1, H) * e(-W, [tau - z]H) == 1."""
        r = self.pairing.r
        g1, g2 = self.pairing.g1, self.pairing.g2
        lhs = refc.add(
            g1,
            commitment,
            refc.scalar_mul(g1, (-v) % r, refc.generator(g1)),
        )
        shifted = refc.add(
            g2, params.tau_g2, refc.scalar_mul(g2, (-z) % r, params.g2_gen)
        )
        if proof is None:
            # identity witness (constant poly, or q(tau) == 0 — the MSM
            # oracles encode the identity as None): e(C - vG, H) == 1 iff
            # C - vG is the identity, by pairing non-degeneracy
            return lhs is None
        if lhs is None:
            # p(tau) == v with a NON-identity witness: the lhs pairing is
            # trivially 1, so the equation holds only if the rhs pairing
            # degenerates too — [tau - z]H identity, i.e. tau == z (which
            # setup keeps secret). The honest opening with q(tau) == 0
            # takes the proof-is-None branch above.
            return shifted is None
        return refpair.pairing_product_is_one(
            self.pairing,
            [(lhs, params.g2_gen), (refc.neg(g1, proof), shifted)],
        )

    def batch_verify(
        self,
        params: KZGParams,
        claims: Sequence[Tuple[Optional[Tuple], int, int, Optional[Tuple]]],
        rng,
    ) -> bool:
        """Random-linear-combination batch of (C, z, v, W) openings at
        arbitrary — shared or DISTINCT — evaluation points, with ONE
        2-pairing product (ark poly-commit KZG10 `batch_check`, general
        form).

        Each valid opening satisfies e(C - vG + zW, H) == e(W, [tau]H)
        (fold the verify equation's (tau - z) factor into the lhs), so a
        rho^j-weighted sum over claims gives
            e(sum rho^j (C_j - v_j G + z_j W_j), H)
              * e(-sum rho^j W_j, [tau]H) == 1
        which is point-set independent."""
        r = self.pairing.r
        g1 = self.pairing.g1
        gen = refc.generator(g1)
        rho = rng.randrange(1, r)
        c_acc, w_acc, w_scale = None, None, 1
        for commitment, z, v, proof in claims:
            term = refc.add(
                g1, commitment, refc.scalar_mul(g1, (-v) % r, gen)
            )
            if proof is not None:
                term = refc.add(
                    g1, term, refc.scalar_mul(g1, z % r, proof)
                )
                w_acc = refc.add(
                    g1, w_acc, refc.scalar_mul(g1, w_scale, proof)
                )
            c_acc = refc.add(g1, c_acc, refc.scalar_mul(g1, w_scale, term))
            w_scale = w_scale * rho % r
        if w_acc is None:
            # all witnesses identity: every claim must be a degenerate
            # (constant / q(tau)=0) opening, i.e. the weighted C - vG sum
            # is identity; e(c_acc, H) == 1 iff c_acc is identity
            return c_acc is None
        if c_acc is None:
            # e(-w_acc, [tau]H) == 1 with tau in [1, r) forces w_acc to be
            # the identity (pairing non-degeneracy) — handled above
            return False
        return refpair.pairing_product_is_one(
            self.pairing,
            [(c_acc, params.g2_gen), (refc.neg(g1, w_acc), params.tau_g2)],
        )
