"""Tune transport_hard's gamma so the 1.6M-row system reproduces the
reference's convergence regime: BiCGStab taking ~2,600-4,000 iterations
(reference README.md:44-51, doc/residual_result.png on Transport.mtx).

Runs classic BiCGStab in df32 on the chip for a ladder of dominance
values; the matrix structure (offsets) is identical across gammas, so
XLA compiles ONCE and every solve is data-only.

Usage: python scripts/tune_hard.py [n] [gamma1,gamma2,...]
"""
import os as _os
import sys as _os_sys
_os_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    # each point is gamma or gamma:theta (theta = K^2 biharmonic
    # weight -> bulk condition ~ kappa(K)^2)
    pts = ([(float(p.split(":")[0]),
             float(p.split(":")[1]) if ":" in p else 0.25)
            for p in sys.argv[2].split(",")]
           if len(sys.argv) > 2 else [(0.9, 50.0)])
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp  # noqa: F401
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import transport_hard
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    cfg = SolverConfig(tol=1e-12, max_iter=6000, dtype=jnp.float32)
    out = []
    for d, th in pts:
        t0 = time.perf_counter()
        csr = transport_hard(n, gamma=d, theta=th)
        prob = build_problem(csr, dtype="df32")
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
        jax.block_until_ready(res.x)
        t_solve = time.perf_counter() - t0
        hist = np.asarray(res.history)[: int(res.n_iter)]
        # iterations to cross 1e-8 relative residual (BASELINE target)
        below = np.nonzero(hist <= 1e-8)[0]
        it_1e8 = int(below[0]) + 1 if below.size else None
        row = {
            "gamma": d, "theta": th,
            "n": int(prob.n_logical),
            "iters": int(res.n_iter),
            "final_relres": float(res.final_relres),
            "converged": bool(res.converged),
            "iters_to_1e-8": it_1e8,
            "gen_s": round(t_gen, 1),
            "solve_s": round(t_solve, 1),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"backend": jax.default_backend(), "rows": out}))


if __name__ == "__main__":
    main()
