"""Checkpoint / resume for persistent framework state.

The reference's analogue is its `Encode`/`Decode` codec on every persistent
object plus `Rollback` transactionality (SURVEY.md section 5, checkpoint
row). Here: Merkle tree state and Groth16 keys round-trip through
numpy-archive checkpoints (TPU arrays are pulled to host; restore re-uploads
lazily on first use)."""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from ..crypto.merkle.tree import MerkleParameters, MerkleTree
from ..fields.spec import get_field


def save_merkle_tree(path: str, tree: MerkleTree) -> None:
    arrays = {f"level_{i}": np.asarray(lvl) for i, lvl in enumerate(tree.levels)}
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(
            json.dumps(
                {
                    "field": tree.parameters.spec.name,
                    "height": tree.parameters.height,
                    "count": tree.count,
                    "n_levels": len(tree.levels),
                }
            ).encode(),
            dtype=np.uint8,
        ),
        **arrays,
    )


def load_merkle_tree(path: str) -> MerkleTree:
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        params = MerkleParameters(get_field(meta["field"]), meta["height"])
        levels = tuple(
            data[f"level_{i}"] for i in range(meta["n_levels"])
        )
    return MerkleTree(params, meta["count"], levels)


def save_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish


def load_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
