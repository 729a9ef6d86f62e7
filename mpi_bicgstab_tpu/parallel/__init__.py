from mpi_bicgstab_tpu.parallel.comm import Comm  # noqa: F401
from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh  # noqa: F401
from mpi_bicgstab_tpu.parallel.partition import (  # noqa: F401
    PartitionedMatrix,
    partition_csr,
)
