"""Multi-chip execution: mesh helpers and sharded kernels.

The reference has no distributed runtime (SURVEY.md section 2.9 — rayon
only); this package is its first-class TPU replacement: `jax.sharding.Mesh`
+ `shard_map` with XLA collectives over ICI (psum/all_gather/ppermute),
multi-host via `jax.distributed`.
"""

from .mesh import data_mesh, local_mesh
from .ops import (
    sharded_coset_intt,
    sharded_coset_ntt,
    sharded_intt,
    sharded_msm,
    sharded_msm_multi,
    sharded_ntt,
    sharded_poseidon_hash,
    sharded_transform,
)

__all__ = [
    "data_mesh",
    "local_mesh",
    "sharded_coset_intt",
    "sharded_coset_ntt",
    "sharded_intt",
    "sharded_msm",
    "sharded_msm_multi",
    "sharded_ntt",
    "sharded_poseidon_hash",
    "sharded_transform",
]
