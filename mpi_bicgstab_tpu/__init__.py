"""mpi_bicgstab_tpu — a TPU-native sparse iterative-solver framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the C/MPI
reference RtrMmmt/MPI-BiCGStab (see /root/reference): Matrix Market
ingestion, 1-D row-partitioned distributed SpMV with gather/compute
overlap, and the BiCGStab Krylov family —

* classic BiCGStab                       (reference: src/solver.c:35)
* CA-BiCGStab (communication-avoiding)   (reference: src/solver.c:160)
* pipelined BiCGStab                     (reference: src/solver.c:292)
* pipelined BiCGStab + residual replace  (reference: src/solver.c:433)
* shifted (multi-sigma) BiCGStab         (reference: src/shifted_solver.c:13)
* shifted LOP-BiCGStab (+v2/no-overlap)  (reference: src/shifted_solver.c:182)
* shifted pipelined LOP-BiCGStab         (reference: src/shifted_solver.c:703)
* shifted LOP-BiCG with per-sigma stops  (reference: src/shifted_switching_solver.c:20)
* seed-switching shifted solver          (reference: src/shifted_switching_solver.c:260)

Design: SPMD over a 1-D `rows` device mesh via jax.shard_map; vectors are
sharded row-slices; the matrix is split per shard into a square diagonal
block (local column indices) and an off-diagonal block (global column
indices), both stored in a padded ELL layout friendly to the TPU VPU.
Distributed SpMV = lax.all_gather of the iterate overlapped by XLA's async
collective scheduler with the diagonal-block multiply; global dot products
are lax.psum of local dots (batched into a single reduction where the
algorithm allows, exactly as the CA variant batches its MPI_Iallreduce
calls). Solver loops are jit-compiled lax.while_loop bodies. The shift
axis of the multi-sigma solvers is a batched leading array dimension.

TPU-first extensions beyond the reference: double-float (df32)
extended precision for f64-class convergence on f32 hardware
(ops/precision), RCM bandwidth-reducing reordering onto the DIA fast
path (ops/reorder), iterate checkpoint/resume (utils/checkpoint), a
hand-written Pallas DIA SpMV kernel (ops/pallas_spmv), and a
multithreaded C++ Matrix Market parser (io/csrc).
"""

__version__ = "0.2.0"

from mpi_bicgstab_tpu.utils.config import ShiftedConfig, SolverConfig  # noqa: F401
