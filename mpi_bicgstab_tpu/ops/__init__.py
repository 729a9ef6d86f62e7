from mpi_bicgstab_tpu.ops.sparse import COOMatrix, CSRMatrix, coo_to_csr  # noqa: F401
from mpi_bicgstab_tpu.ops.ell import EllMatrix, csr_to_ell  # noqa: F401
from mpi_bicgstab_tpu.ops.spmv import ell_spmv, ell_spmv_shifted  # noqa: F401
from mpi_bicgstab_tpu.ops.blas import dot, dots, axpy  # noqa: F401
from mpi_bicgstab_tpu.ops.dia import DiaMatrix, csr_to_dia, dia_spmv, analyze_diagonals  # noqa: F401,E402
from mpi_bicgstab_tpu.ops.layout import HybridMatrix, build_operator, spmv  # noqa: F401,E402
