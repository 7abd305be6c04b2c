"""Device mesh construction (single- and multi-host)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def local_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n local devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def data_mesh(axis: str = "data") -> Mesh:
    """Global 1-D data mesh across all processes (multi-host via DCN).

    On multi-host deployments call `jax.distributed.initialize()` first;
    jax.devices() then spans every host and XLA routes collectives over
    ICI within a slice and DCN across hosts.
    """
    return Mesh(np.array(jax.devices()), axis_names=(axis,))
