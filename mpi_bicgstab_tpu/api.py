"""High-level single-device solve API.

(The distributed entry points live in parallel/driver.py; this module is
the jit glue for one chip — the `mpirun -np 1` case of the reference.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpi_bicgstab_tpu.ops.ell import EllMatrix
from mpi_bicgstab_tpu.ops.spmv import ell_spmv
from mpi_bicgstab_tpu.parallel.comm import Comm
from mpi_bicgstab_tpu.solvers.bicgstab import CLASSIC_SOLVERS
from mpi_bicgstab_tpu.utils.config import SolverConfig


@partial(jax.jit, static_argnames=("method", "cfg"))
def _solve_jit(A: EllMatrix, b, x0, method: str, cfg: SolverConfig):
    comm = Comm(None)
    return CLASSIC_SOLVERS[method](lambda v: ell_spmv(A, v), comm, b, x0, cfg)


def solve(A: EllMatrix, b, x0=None, method: str = "bicgstab",
          cfg: SolverConfig | None = None):
    """Solve A x = b with one of the classic BiCGStab family on the
    current default device. Method names match the reference driver's
    dispatch strings (main.c:122-141)."""
    if method not in CLASSIC_SOLVERS:
        raise ValueError(f"unknown method {method!r}; "
                         f"choose from {sorted(CLASSIC_SOLVERS)}")
    b = jnp.asarray(b)
    if cfg is None:
        cfg = SolverConfig(dtype=b.dtype)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _solve_jit(A, b, x0, method, cfg)
