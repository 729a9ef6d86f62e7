from mpi_bicgstab_tpu.io.mmio import (  # noqa: F401
    MMHeader,
    read_banner,
    read_matrix_market,
    write_matrix_market,
)
