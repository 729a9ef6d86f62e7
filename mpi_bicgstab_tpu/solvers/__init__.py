from mpi_bicgstab_tpu.solvers.base import SolveResult, ShiftedResult  # noqa: F401
from mpi_bicgstab_tpu.solvers.bicgstab import (  # noqa: F401
    bicgstab,
    ca_bicgstab,
    pipe_bicgstab,
    pipe_bicgstab_rr,
)
