"""Device mesh helpers.

The reference's process topology is MPI_COMM_WORLD, a flat rank list
(matrix.c:278-279). The TPU equivalent is a 1-D jax mesh with one named
axis `rows`: every vector is sharded P('rows'), the matrix by row blocks,
and all collectives (all_gather / psum) run over that axis on ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n_devices (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ROWS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [n] vectors and [n]-leading tail arrays."""
    return NamedSharding(mesh, P(ROWS))


def slab_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for slab-major ELL arrays [width, n]: rows axis is dim 1."""
    return NamedSharding(mesh, P(None, ROWS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
