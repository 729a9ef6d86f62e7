"""Record per-iteration residual curves for all four classic methods on
the hard-convergence benchmark — the reproduction of the reference's
doc/residual_result.png (README.md:44-51) at full 1.6M-row scale.

Writes docs/data/r2_hard{label}_{dtype}_{method}.csv (iter,relres) and
prints a JSON summary row per method with the TRUE residual
||b - A x|| / ||b|| recomputed on host in f64.

Usage: python scripts/record_curves.py [n] [dtype] [tol] [max_iter]
"""
import os as _os
import sys as _os_sys
_os_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import os
import sys
import time

import numpy as np

METHODS = ["bicgstab", "ca_bicgstab", "pipe_bicgstab", "pipe_bicgstab_rr"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    dtype_name = sys.argv[2] if len(sys.argv) > 2 else "df32"
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-14
    max_iter = int(sys.argv[4]) if len(sys.argv) > 4 else 6000
    import jax
    if dtype_name == "float64" or (
            dtype_name == "df32" and jax.default_backend() != "tpu"):
        # df32 on TPU runs with x64 OFF: the fused Pallas paths are
        # gated off under x64 (Mosaic lane rolls), DF arithmetic needs
        # no x64 there, and the round-5 refresh exists precisely to
        # record the FUSED kernels' trajectories; on CPU x64 guards
        # the EFTs against LLVM fast-math contraction (precision.py)
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import transport_hard
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, is_df
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    t0 = time.perf_counter()
    csr = transport_hard(n)
    prob = build_problem(csr, dtype=dtype_name if dtype_name == "df32"
                         else jnp.dtype(dtype_name))
    gen_s = time.perf_counter() - t0
    label = f"{prob.n_logical // 1000}k"
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "data")
    os.makedirs(outdir, exist_ok=True)
    b64 = np.asarray(df_to_f64(prob.b) if is_df(prob.b)
                     else np.asarray(prob.b, np.float64))
    nb = np.linalg.norm(b64)
    print(json.dumps({"n": prob.n_logical, "nnz": csr.nnz,
                      "gen_s": round(gen_s, 1),
                      "backend": jax.default_backend()}), flush=True)

    cfg_dtype = jnp.float32 if dtype_name == "df32" else \
        jnp.dtype(dtype_name)
    # krr chosen so residual replacement FIRES several times inside the
    # ~2,500-iteration convergence (VERDICT: RR must actually execute
    # at scale); reference runs used krr/nrr from argv (main.c:134-135)
    cfg = SolverConfig(tol=tol, max_iter=max_iter, dtype=cfg_dtype,
                       krr=400, nrr=8)
    for method in METHODS:
        t0 = time.perf_counter()
        res = solve(prob.A, prob.b, method=method, cfg=cfg)
        jax.block_until_ready(res.x)
        dt = time.perf_counter() - t0
        k = int(res.n_iter)
        hist = np.asarray(res.history)[:k]
        path = os.path.join(outdir,
                            f"r2_hard{label}_{dtype_name}_{method}.csv")
        np.savetxt(path, np.c_[np.arange(1, k + 1), hist],
                   header="iter,relres", delimiter=",", comments="")
        x64 = (df_to_f64(res.x) if is_df(res.x)
               else np.asarray(res.x, np.float64))
        true_rel = float(np.linalg.norm(
            b64[: csr.nrows] - csr.matvec(x64[: csr.nrows])) / nb)
        print(json.dumps({
            "method": method, "iters": k,
            "final_relres": float(res.final_relres),
            "true_relres": true_rel,
            "converged": bool(res.converged),
            "wall_s": round(dt, 1), "curve": os.path.basename(path),
        }), flush=True)


if __name__ == "__main__":
    main()
