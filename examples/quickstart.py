"""Quickstart: the library API end to end on any backend.

    JAX_PLATFORMS=cpu python examples/quickstart.py      # laptop
    python examples/quickstart.py                        # TPU

Covers: building/loading a system, the classic + shifted solves, the
distributed mesh path, and the df32 extended-precision mode.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from mpi_bicgstab_tpu.api import solve, solve_shifted  # noqa: E402
from mpi_bicgstab_tpu.models.generators import banded_random  # noqa: E402
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.ops.precision import df_to_f64  # noqa: E402
from mpi_bicgstab_tpu.utils.config import (ShiftedConfig,  # noqa: E402
                                           SolverConfig)

# --- build a system (or: csr = ops.sparse.load_csr("yours.mtx")) ---------
csr = banded_random(4096, [1, -1, 16, -16], seed=0)
prob = build_problem(csr, dtype=jnp.float64)   # b = A @ ones

# --- classic solve --------------------------------------------------------
res = solve(prob.A, prob.b, method="pipe_bicgstab",
            cfg=SolverConfig(tol=1e-10, max_iter=1000))
x = np.asarray(res.x)
print(f"pipe_bicgstab: {int(res.n_iter)} iters, "
      f"relres {float(res.final_relres):.2e}, "
      f"max|x-1| {np.abs(x[:csr.nrows] - 1).max():.2e}")

# --- shifted family: (A + sigma_j I) x_j = b from ONE Krylov sequence ----
sigma = np.array([0.0, 0.01, 0.05, 0.2])
res_s = solve_shifted(prob.A, prob.b, sigma, seed=0,
                      method="shifted_lopbicg_switching",
                      cfg=ShiftedConfig(tol=1e-10, max_iter=1000))
print(f"shifted ({sigma.size} shifts): {int(res_s.n_iter)} iters, "
      f"all converged: {bool(np.asarray(res_s.stop_flags).all())}")

# --- df32: f64-class precision on f32-only TPU hardware ------------------
prob_df = build_problem(csr, dtype="df32")
res_df = solve(prob_df.A, prob_df.b, method="bicgstab",
               cfg=SolverConfig(tol=1e-12, max_iter=1000,
                                dtype=jnp.float32))
x_df = df_to_f64(res_df.x)
print(f"df32: relres {float(res_df.final_relres):.2e}, "
      f"max|x-1| {np.abs(x_df[:csr.nrows] - 1).max():.2e} "
      f"(plain f32 floors at ~1e-7)")

# --- Chebyshev preconditioning: ~10x fewer iterations on hard systems ----
from mpi_bicgstab_tpu.models.generators import transport_hard  # noqa: E402
from mpi_bicgstab_tpu.ops.cheby import (ChebyPrecond,  # noqa: E402
                                        estimate_bounds)

csr_h = transport_hard(4096)
prob_h = build_problem(csr_h)
lo, hi = estimate_bounds(csr_h)
r_plain = solve(prob_h.A, prob_h.b, cfg=SolverConfig(tol=1e-10,
                                                     max_iter=3000))
r_prec = solve(prob_h.A, prob_h.b, cfg=SolverConfig(tol=1e-10,
                                                    max_iter=3000),
               precond=ChebyPrecond(degree=8, lo=lo, hi=hi))
print(f"hard regime: {int(r_plain.n_iter)} iters plain -> "
      f"{int(r_prec.n_iter)} with cheby:8")

# --- batched multi-RHS: k solves for ~the HBM cost of one -----------------
from mpi_bicgstab_tpu.api import solve_batched  # noqa: E402

rng = np.random.default_rng(0)
B = np.stack([csr.matvec(rng.standard_normal(csr.nrows))
              for _ in range(4)])
Bp = np.zeros((4, prob.n))
Bp[:, : csr.nrows] = B
res_b = solve_batched(prob.A, jnp.asarray(Bp),
                      cfg=SolverConfig(tol=1e-10, max_iter=1000))
print(f"batched 4-RHS: n_iter per system "
      f"{np.asarray(res_b.n_iter).tolist()}, all converged: "
      f"{bool(np.asarray(res_b.converged).all())}")

# --- distributed over every visible device -------------------------------
n_dev = len(jax.devices())
if n_dev > 1:
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    part = partition_csr(csr, n_dev, dtype=np.float64)
    b = csr.matvec(np.ones(csr.nrows))
    res_d = solve_distributed(part, b, method="pipe_bicgstab",
                              cfg=SolverConfig(tol=1e-10, max_iter=1000))
    print(f"distributed over {n_dev} devices: {int(res_d.n_iter)} iters, "
          f"converged: {bool(res_d.converged)}")
else:
    print(f"(1 device visible — run with "
          f"XLA_FLAGS=--xla_force_host_platform_device_count=8 "
          f"JAX_PLATFORMS=cpu for the mesh demo)")

# --- BiCGStab(l): spectra the classic family cannot solve -----------------
from mpi_bicgstab_tpu.models.generators import skew_banded  # noqa: E402

csr_s = skew_banded(1024)
prob_s = build_problem(csr_s)
r_classic = solve(prob_s.A, prob_s.b, method="bicgstab",
                  cfg=SolverConfig(tol=1e-10, max_iter=2000, restarts=0))
r_l2 = solve(prob_s.A, prob_s.b, method="bicgstab_l2",
             cfg=SolverConfig(tol=1e-10, max_iter=2000, restarts=0))
print(f"skew-dominant spectrum: classic converged="
      f"{bool(r_classic.converged)} (true relres "
      f"{float(r_classic.true_relres):.1e}); bicgstab_l2 converged="
      f"{bool(r_l2.converged)} in {int(r_l2.n_iter)} iters")

# --- sigma-sharded shifted ladder: 2-D (rows x sigma) mesh ----------------
if n_dev >= 8:
    from mpi_bicgstab_tpu.parallel.driver import solve_shifted_distributed
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig
    sig = np.array([0.0, 0.02, 0.1, 0.5])
    b_s = csr.matvec(np.ones(csr.nrows)) + sig[3] * np.ones(csr.nrows)
    part2 = partition_csr(csr, 2, dtype=np.float64)
    res_sg = solve_shifted_distributed(
        part2, b_s, sig, seed=3,
        cfg=ShiftedConfig(tol=1e-10, max_iter=1000), sigma_devices=4)
    print(f"sigma-sharded (2 rows x 4 sigma): {int(res_sg.n_iter)} iters, "
          f"all shifts stopped: "
          f"{bool(np.asarray(res_sg.stop_flags).all())}")
