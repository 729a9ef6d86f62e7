from mpi_bicgstab_tpu.utils.config import SolverConfig, ShiftedConfig  # noqa: F401
from mpi_bicgstab_tpu.utils.timing import Timer, PhaseTimer  # noqa: F401
