from mpi_bicgstab_tpu.models.generators import (  # noqa: F401
    poisson2d,
    poisson3d,
    banded_random,
    random_diag_dominant,
    transport_like,
)
from mpi_bicgstab_tpu.models.problem import Problem, build_problem  # noqa: F401
