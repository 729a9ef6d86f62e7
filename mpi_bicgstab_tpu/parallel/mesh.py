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
SIGMA = "sigma"


def make_grid_mesh(n_rows: int, n_sigma: int, devices=None) -> Mesh:
    """2-D mesh (rows x sigma) for sigma-sharded shifted solves: the
    row partition of A/vectors on one axis, the shift ladder's [S, n]
    slabs on the other (parallel/sigma.py). Uses the first
    n_rows * n_sigma devices."""
    if devices is None:
        devices = jax.devices()
    need = n_rows * n_sigma
    if need > len(devices):
        raise ValueError(
            f"requested {n_rows}x{n_sigma} mesh, only {len(devices)} "
            "devices present")
    return Mesh(np.array(devices[:need]).reshape(n_rows, n_sigma),
                (ROWS, SIGMA))


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
