"""ctypes loader for the native host runtime (native/field256.cpp).

Provides batched canonical-bytes <-> planar-limb conversion with Montgomery
transforms. Falls back to the pure-Python loops in
:mod:`openzl_tpu.fields.limb` when the shared library is absent; build it
with `make -C native` (g++ only, no external deps).
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

from ..fields.spec import FieldSpec

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libozlfield.so",
)


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.ozl_to_mont_limbs16.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, u64p, u64p,
        ctypes.c_uint64, ctypes.c_int, u32p, ctypes.c_int,
    ]
    lib.ozl_from_mont_limbs16.argtypes = [
        u32p, ctypes.c_int64, u64p, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.ozl_pack_limbs16.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, u32p, ctypes.c_int,
    ]
    lib.ozl_unpack_limbs16.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int, u8p, ctypes.c_int,
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _u64_limbs(x: int, n64: int) -> np.ndarray:
    return np.array(
        [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(n64)],
        dtype=np.uint64,
    )


def _field_consts(spec: FieldSpec):
    n64 = -(-spec.n_limbs // 4)
    r = (1 << (64 * n64)) % spec.modulus
    # the python radix 2^(16*n16) must equal 2^(64*n64): n16 = 4*n64 always
    # holds for our fields (n_limbs is computed from bit length; assert it)
    assert spec.n_limbs == 4 * n64 or (1 << (16 * spec.n_limbs)) == (
        1 << (64 * n64)
    ), f"radix mismatch for {spec.name}"
    r2 = r * r % spec.modulus
    n0inv = (-pow(spec.modulus, -1, 1 << 64)) % (1 << 64)
    return (
        _u64_limbs(spec.modulus, n64),
        _u64_limbs(r2, n64),
        np.uint64(n0inv),
        n64,
    )


def _as_bytes_le(spec: FieldSpec, values: np.ndarray) -> tuple[np.ndarray, int]:
    stride = -(-spec.bits // 8)
    flat = values.reshape(-1)
    buf = np.empty((flat.shape[0], stride), dtype=np.uint8)
    for i, v in enumerate(flat):
        buf[i] = np.frombuffer(
            int(v).to_bytes(stride, "little"), dtype=np.uint8
        )
    return buf, stride


def to_mont_limbs(spec: FieldSpec, values) -> Optional[np.ndarray]:
    """Python ints -> Montgomery planar limbs (n_limbs, *batch); None if the
    native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    arr = np.asarray(values, dtype=object)
    buf, stride = _as_bytes_le(spec, arr)
    count = buf.shape[0]
    mod, r2, n0inv, n64 = _field_consts(spec)
    out = np.empty((spec.n_limbs, count), dtype=np.uint32)
    lib.ozl_to_mont_limbs16(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count,
        stride,
        mod.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        r2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n0inv,
        n64,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        spec.n_limbs,
    )
    return out.reshape((spec.n_limbs,) + arr.shape)


def pack_limbs(spec: FieldSpec, values) -> Optional[np.ndarray]:
    """Python ints -> CANONICAL planar limbs (no Montgomery transform)."""
    lib = _lib()
    if lib is None:
        return None
    arr = np.asarray(values, dtype=object)
    buf, stride = _as_bytes_le(spec, arr)
    count = buf.shape[0]
    out = np.empty((spec.n_limbs, count), dtype=np.uint32)
    lib.ozl_pack_limbs16(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count,
        stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        spec.n_limbs,
    )
    return out.reshape((spec.n_limbs,) + arr.shape)


def unpack_limbs(spec: FieldSpec, limbs: np.ndarray) -> Optional[np.ndarray]:
    """Canonical planar limbs -> object array of Python ints."""
    lib = _lib()
    if lib is None:
        return None
    limbs = np.ascontiguousarray(np.asarray(limbs), dtype=np.uint32)
    batch_shape = limbs.shape[1:]
    count = int(np.prod(batch_shape)) if batch_shape else 1
    flat = limbs.reshape(spec.n_limbs, count)
    stride = -(-spec.bits // 8)
    out = np.empty((count, stride), dtype=np.uint8)
    lib.ozl_unpack_limbs16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        count,
        spec.n_limbs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        stride,
    )
    vals = np.empty(count, dtype=object)
    for i in range(count):
        vals[i] = int.from_bytes(out[i].tobytes(), "little")
    if batch_shape == ():
        return np.array(vals[0], dtype=object)
    return vals.reshape(batch_shape)


def from_mont_limbs(spec: FieldSpec, limbs: np.ndarray) -> Optional[np.ndarray]:
    """Montgomery planar limbs -> object array of canonical ints."""
    lib = _lib()
    if lib is None:
        return None
    limbs = np.ascontiguousarray(np.asarray(limbs), dtype=np.uint32)
    batch_shape = limbs.shape[1:]
    count = int(np.prod(batch_shape)) if batch_shape else 1
    flat = limbs.reshape(spec.n_limbs, count)
    mod, _, n0inv, n64 = _field_consts(spec)
    stride = -(-spec.bits // 8)
    out = np.empty((count, stride), dtype=np.uint8)
    lib.ozl_from_mont_limbs16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        count,
        mod.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n0inv,
        n64,
        spec.n_limbs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        stride,
    )
    vals = np.empty(count, dtype=object)
    for i in range(count):
        vals[i] = int.from_bytes(out[i].tobytes(), "little")
    if batch_shape == ():
        return np.array(vals[0], dtype=object)
    return vals.reshape(batch_shape)
