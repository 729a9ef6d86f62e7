"""Distributed solve driver: shard_map over the 1-D `rows` mesh.

The TPU equivalent of the reference's main()s: partition the matrix
(parallel/partition.py), lay the shards on the mesh, and run a solver
from solvers/ inside jax.shard_map with psum dots and all_gather SpMV.
The same solver code runs here and single-device (api.py) — only the
Comm axis differs.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mpi_bicgstab_tpu.parallel.comm import Comm
from mpi_bicgstab_tpu.parallel.dist_spmv import spmv_allgather, spmv_ring
from mpi_bicgstab_tpu.parallel.mesh import ROWS, make_row_mesh
from mpi_bicgstab_tpu.parallel.partition import PartitionedMatrix
from mpi_bicgstab_tpu.solvers.base import SolveResult
from mpi_bicgstab_tpu.solvers.bicgstab import CLASSIC_SOLVERS
from mpi_bicgstab_tpu.utils.config import SolverConfig

_SLAB = P(None, ROWS)
_VEC = P(ROWS)
_REP = P()

# in_specs for PartitionedMatrix.arrays order
_MATRIX_SPECS = (_SLAB, _SLAB, _VEC, _VEC, _VEC,
                 _SLAB, _SLAB, _VEC, _VEC, _VEC)


def put_partitioned(part: PartitionedMatrix, mesh) -> PartitionedMatrix:
    """Lay the stacked shard arrays onto the mesh (the jax.device_put
    analogue of each rank holding its own blocks after loading)."""
    slab = NamedSharding(mesh, _SLAB)
    vec = NamedSharding(mesh, _VEC)
    shardings = dict(
        diag_cols=slab, diag_vals=slab, diag_tail_rows=vec,
        diag_tail_cols=vec, diag_tail_vals=vec,
        offd_cols=slab, offd_vals=slab, offd_tail_rows=vec,
        offd_tail_cols=vec, offd_tail_vals=vec,
    )
    kw = {k: jax.device_put(np.asarray(getattr(part, k)), s)
          for k, s in shardings.items()}
    return dataclasses.replace(part, **kw)


def pad_vector(v, n_global: int):
    """Zero-pad a host vector of logical length to the padded global
    size (padded components are exactly 0 throughout every solve)."""
    v = np.asarray(v)
    if v.shape[0] == n_global:
        return v
    out = np.zeros((n_global,) + v.shape[1:], dtype=v.dtype)
    out[: v.shape[0]] = v
    return out


def put_vector(v, part: PartitionedMatrix, mesh, dtype=None):
    v = pad_vector(v, part.n_global)
    if dtype is not None:
        v = v.astype(dtype)
    return jax.device_put(v, NamedSharding(mesh, _VEC))


def make_dist_spmv(part: PartitionedMatrix, mesh, halo: str = "allgather"):
    """A jitted global-view distributed SpMV: f(x_global) -> y_global,
    for tests and the nnz/s benchmark."""

    def run(*args):
        *mat, x_loc = args
        diag, offd = part.local_blocks(*mat)
        comm = Comm(ROWS)
        if halo == "ring":
            return spmv_ring(diag, offd, comm, x_loc, part.n_devices)
        return spmv_allgather(diag, offd, comm, x_loc)

    sm = jax.shard_map(run, mesh=mesh, in_specs=_MATRIX_SPECS + (_VEC,),
                       out_specs=_VEC, check_vma=False)
    jitted = jax.jit(sm)
    return lambda x: jitted(*part.arrays, x)


@partial(jax.jit,
         static_argnames=("method", "cfg", "mesh", "halo", "n_devices",
                          "part_meta"))
def _solve_dist_jit(mat_arrays, b, x0, method, cfg, mesh, halo, n_devices,
                    part_meta):
    n_loc, n_global = part_meta

    def run(*args):
        *mat, b_loc, x0_loc = args
        from mpi_bicgstab_tpu.ops.ell import EllMatrix
        dc, dv, dtr, dtc, dtv, oc, ov, otr, otc, otv = mat
        diag = EllMatrix(dc, dv, dtr, dtc, dtv, n_loc, n_loc)
        offd = EllMatrix(oc, ov, otr, otc, otv, n_loc, n_global)
        comm = Comm(ROWS)
        if halo == "ring":
            spmv = lambda x: spmv_ring(diag, offd, comm, x, n_devices)  # noqa: E731
        else:
            spmv = lambda x: spmv_allgather(diag, offd, comm, x)        # noqa: E731
        return CLASSIC_SOLVERS[method](spmv, comm, b_loc, x0_loc, cfg)

    out_specs = SolveResult(x=_VEC, n_iter=_REP, final_relres=_REP,
                            history=_REP, converged=_REP)
    sm = jax.shard_map(run, mesh=mesh,
                       in_specs=_MATRIX_SPECS + (_VEC, _VEC),
                       out_specs=out_specs, check_vma=False)
    return sm(*mat_arrays, b, x0)


@partial(jax.jit,
         static_argnames=("method", "seed", "cfg", "mesh", "halo",
                          "n_devices", "part_meta"))
def _solve_shifted_dist_jit(mat_arrays, b, sigma, method, seed, cfg, mesh,
                            halo, n_devices, part_meta):
    from mpi_bicgstab_tpu.ops.ell import EllMatrix
    from mpi_bicgstab_tpu.solvers.base import ShiftedResult
    from mpi_bicgstab_tpu.solvers.shifted import SHIFTED_SOLVERS
    from mpi_bicgstab_tpu.solvers.switching import SWITCHING_SOLVERS

    n_loc, n_global = part_meta
    solvers = {**SHIFTED_SOLVERS, **SWITCHING_SOLVERS}

    def run(*args):
        *mat, b_loc, sig = args
        dc, dv, dtr, dtc, dtv, oc, ov, otr, otc, otv = mat
        diag = EllMatrix(dc, dv, dtr, dtc, dtv, n_loc, n_loc)
        offd = EllMatrix(oc, ov, otr, otc, otv, n_loc, n_global)
        comm = Comm(ROWS)
        if halo == "ring":
            spmv = lambda x: spmv_ring(diag, offd, comm, x, n_devices)  # noqa: E731
        else:
            spmv = lambda x: spmv_allgather(diag, offd, comm, x)        # noqa: E731
        fn = solvers[method]
        if method == "shifted_bicgstab":
            return fn(spmv, comm, b_loc, sig, cfg)
        return fn(spmv, comm, b_loc, sig, seed, cfg)

    x_set_spec = P(None, ROWS)
    out_specs = ShiftedResult(x_set=x_set_spec, n_iter=_REP,
                              final_relres=_REP, history=_REP,
                              stop_flags=_REP, final_seed=_REP)
    sm = jax.shard_map(run, mesh=mesh,
                       in_specs=_MATRIX_SPECS + (_VEC, _REP),
                       out_specs=out_specs, check_vma=False)
    return sm(*mat_arrays, b, sigma)


def solve_shifted_distributed(part: PartitionedMatrix, b, sigma,
                              seed: int = 0,
                              method: str = "shifted_lopbicg_switching",
                              cfg=None, mesh=None,
                              halo: str = "allgather"):
    """Distributed multi-shift solve: (A + sigma_j I) x_j = b for the
    whole ladder, seed system only on the wire (the distributed analogue
    of main_shifted.c / main_repeat.c driving shifted_lopbicg_switching).
    x_set in the result is [n_sigma, n_global] sharded on the row axis."""
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig

    mesh = mesh or make_row_mesh(part.n_devices)
    if mesh.devices.size != part.n_devices:
        raise ValueError(
            f"mesh has {mesh.devices.size} devices but the matrix was "
            f"partitioned for {part.n_devices}")
    if not isinstance(part.diag_cols, jax.Array):
        part = put_partitioned(part, mesh)
    dtype = part.diag_vals.dtype
    if cfg is None:
        cfg = ShiftedConfig(dtype=dtype)
    sigma = np.asarray(sigma, dtype=dtype)
    if not (0 <= seed < sigma.shape[0]):
        raise ValueError(f"seed {seed} out of range for {sigma.shape[0]} shifts")
    b_d = put_vector(b, part, mesh, dtype)
    sig_d = jax.device_put(sigma, NamedSharding(mesh, _REP))
    return _solve_shifted_dist_jit(part.arrays, b_d, sig_d, method,
                                   int(seed), cfg, mesh, halo,
                                   part.n_devices,
                                   (part.n_loc, part.n_global))


def solve_distributed(part: PartitionedMatrix, b, x0=None,
                      method: str = "bicgstab",
                      cfg: SolverConfig | None = None, mesh=None,
                      halo: str = "allgather") -> SolveResult:
    """Distributed solve of A x = b over a 1-D row mesh.

    part: PartitionedMatrix (host arrays are laid out automatically).
    b:    RHS of length n_logical or n_global.
    """
    if method not in CLASSIC_SOLVERS:
        raise ValueError(f"unknown method {method!r}")
    if halo not in ("allgather", "ring"):
        raise ValueError(f"unknown halo strategy {halo!r}")
    mesh = mesh or make_row_mesh(part.n_devices)
    if mesh.devices.size != part.n_devices:
        raise ValueError(
            f"mesh has {mesh.devices.size} devices but the matrix was "
            f"partitioned for {part.n_devices}")
    if not isinstance(part.diag_cols, jax.Array):
        part = put_partitioned(part, mesh)
    dtype = part.diag_vals.dtype
    if cfg is None:
        cfg = SolverConfig(dtype=dtype)
    b_d = put_vector(b, part, mesh, dtype)
    x0_d = (put_vector(x0, part, mesh, dtype) if x0 is not None
            else jnp.zeros_like(b_d))
    return _solve_dist_jit(part.arrays, b_d, x0_d, method, cfg, mesh,
                           halo, part.n_devices,
                           (part.n_loc, part.n_global))
