"""Persistent AOT-executable cache: skip BOTH Python tracing and XLA
compilation in fresh processes (VERDICT r4 item 5 — the cold-start floor).

The XLA persistent compile cache removes recompilation but not (a) the
Python trace of every jitted graph (seconds to minutes for the big MSM /
NTT graphs) or (b) cache-key hashing of the traced jaxpr. This module
caches one level higher: the *loaded executable*. `aot_jit` is a drop-in
for `functools.partial(jax.jit, static_argnums=...)`; when the
`OZL_AOT_CACHE` env var names a directory, each (function, static args,
dynamic shapes, backend) signature is served from a serialized executable
on disk (`jax.experimental.serialize_executable`) — a fresh process
deserializes and runs without ever tracing the function.

Fail-open by design: any serialize/deserialize error (e.g. a PJRT
backend without executable serialization support) permanently disables
the cache for the process and falls back to the plain jit path, so
correctness never depends on the cache.

The reference has no analogue (Rust is AOT by construction —
compile-once is the property this module restores on the JAX side).
"""

from __future__ import annotations

import functools
import hashlib
import logging
import os
import pickle
import threading

import numpy as np

import jax

_log = logging.getLogger(__name__)
_lock = threading.Lock()
_disabled = False  # set on first serialization failure (fail-open)

#: process-wide loaded-executable table: key -> Compiled
_loaded = {}

#: instrumentation for the cold-start breakdown (tools/bench_coldstart.py)
STATS = {"hits": 0, "misses": 0, "load_s": 0.0, "compile_s": 0.0}


def cache_dir():
    d = os.environ.get("OZL_AOT_CACHE")
    if not d or _disabled:
        return None
    os.makedirs(d, exist_ok=True)
    return d


def _arg_sig(a):
    """Shape/dtype signature of one dynamic argument."""
    if hasattr(a, "shape") and hasattr(a, "dtype"):
        return (tuple(a.shape), str(a.dtype))
    if isinstance(a, (bool, int, float, complex)):
        # weak-typed scalar: keyed by Python type only (value is traced
        # as a dynamic operand)
        return ("py", type(a).__name__)
    return ("repr", repr(a))


def _key(fun, statics, dyn):
    dev = jax.devices()[0]
    parts = (
        jax.__version__,
        dev.platform,
        getattr(dev, "device_kind", ""),
        f"{fun.__module__}.{fun.__qualname__}",
        repr(statics),
        repr([_arg_sig(a) for a in dyn]),
    )
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()[:32]


def aot_jit(fun=None, *, static_argnums=(), donate_argnums=()):
    """`jax.jit` with a persistent loaded-executable cache (opt-in via
    OZL_AOT_CACHE). Positional calls only — keyword calls fall back to
    the plain jit path."""
    if fun is None:
        return functools.partial(
            aot_jit,
            static_argnums=static_argnums,
            donate_argnums=donate_argnums,
        )
    if isinstance(static_argnums, int):
        static_argnums = (static_argnums,)
    jitted = jax.jit(
        fun, static_argnums=static_argnums, donate_argnums=donate_argnums
    )

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        global _disabled
        d = cache_dir()
        if d is None or kwargs or donate_argnums:
            return jitted(*args, **kwargs)
        import time

        statics = tuple(args[i] for i in static_argnums)
        dyn = [a for i, a in enumerate(args) if i not in static_argnums]
        try:
            key = _key(fun, statics, dyn)
        except Exception:
            return jitted(*args)
        compiled = _loaded.get(key)
        if compiled is None:
            from jax.experimental import serialize_executable as se

            path = os.path.join(d, key + ".aotx")
            try:
                if os.path.exists(path):
                    t0 = time.perf_counter()
                    with open(path, "rb") as f:
                        n_dev, blob = pickle.load(f)
                    # the executable must load onto the same device count
                    # it was compiled for (a single-device jit on the
                    # 8-virtual-device CPU mesh otherwise loads expecting
                    # 8 input shards)
                    compiled = se.deserialize_and_load(
                        *blob, execution_devices=jax.devices()[:n_dev]
                    )
                    STATS["hits"] += 1
                    STATS["load_s"] += time.perf_counter() - t0
                else:
                    t0 = time.perf_counter()
                    compiled = jitted.lower(*args).compile()
                    blob = se.serialize(compiled)
                    try:
                        n_dev = len(
                            compiled._executable.xla_executable.local_devices()
                        )
                    except Exception:
                        n_dev = 1
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        pickle.dump((n_dev, blob), f)
                    os.replace(tmp, path)
                    STATS["misses"] += 1
                    STATS["compile_s"] += time.perf_counter() - t0
            except Exception as e:  # fail-open: disable for the process
                _log.warning("aot cache disabled: %r", e)
                with _lock:
                    _disabled = True
                return jitted(*args)
            with _lock:
                _loaded[key] = compiled
        return compiled(*dyn)

    wrapper._jitted = jitted  # escape hatch (lower/compile introspection)
    return wrapper
