"""Compiled-Pallas correctness check ON THE CHIP — the CI-fashion run
of both hand-written kernels (round-1 VERDICT: chip coverage of the
compiled Pallas path was manual).

Runs WITHOUT jax_enable_x64 (the Mosaic x64 hazard: nonzero lane-shift
rolls fail legalization under x64 — ops/pallas_spmv.py docstring; the
production f32 pipeline never enables x64 on device). Compares each
kernel against its XLA reference path at small scale and prints one
JSON line per kernel.

Usage: python scripts/chip_pallas_check.py       (needs the TPU backend)
"""
import os as _os
import sys as _os_sys
_os_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    if jax.default_backend() not in ("tpu",):
        print(json.dumps({"skipped": f"backend={jax.default_backend()}"}))
        return 0
    assert not jax.config.jax_enable_x64, "run without x64 (Mosaic fence)"
    ok = True

    # --- DIA kernel vs XLA pad+slice path ---------------------------
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.ops.pallas_spmv import (available,
                                                  dia_spmv_pallas)
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=5)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    A = prob.A
    assert available(A, block_rows=8192), "DIA kernel not applicable?"
    x = jnp.asarray(np.random.default_rng(0).standard_normal(prob.n),
                    jnp.float32)
    y_pallas = np.asarray(dia_spmv_pallas(A, x, block_rows=8192))
    y_xla = np.asarray(dia_spmv(A, x))
    dia_exact = bool((y_pallas == y_xla).all())
    err = float(np.abs(y_pallas - y_xla).max())
    print(json.dumps({"kernel": "dia_spmv_pallas", "bit_exact": dia_exact,
                      "max_abs_diff": err}), flush=True)
    ok &= err < 1e-5

    # --- windowed-ELL kernel vs host CSR ----------------------------
    from mpi_bicgstab_tpu.models.generators import clustered_random
    from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv
    from mpi_bicgstab_tpu.ops.window_ell import csr_to_window_ell
    csr_w = clustered_random(4096, seed=2)
    W = csr_to_window_ell(csr_w, dtype=np.float32)
    xw = np.random.default_rng(1).standard_normal(csr_w.nrows)
    y = np.asarray(window_spmv(W, jnp.asarray(xw, jnp.float32)),
                   np.float64)
    y_ref = csr_w.matvec(xw)
    rel = float(np.abs(y - y_ref).max() / np.abs(y_ref).max())
    print(json.dumps({"kernel": "window_spmv", "rel_err": rel}),
          flush=True)
    ok &= rel < 1e-5

    # --- df32 windowed-ELL kernel (DF pairs through the two gathers) --
    from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv_df
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    Wdf = csr_to_window_ell(csr_w, dtype="df32")
    ydf = df_to_f64(window_spmv_df(Wdf, df_from_f64(xw)))
    rel_df = float(np.abs(ydf - y_ref).max() / np.abs(y_ref).max())
    print(json.dumps({"kernel": "window_spmv_df", "rel_err": rel_df}),
          flush=True)
    ok &= rel_df < 1e-12
    # --- fused pipe iteration (VERDICT #4) vs XLA pipe -----------------
    import os
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe as fp
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    import jax.numpy as _jnp
    cfg = SolverConfig(tol=1e-5, max_iter=100, dtype=_jnp.float32)
    assert fp.available(prob.A, _jnp.float32)
    res_f = fp.pipe_bicgstab_fused(prob.A, prob.b,
                                   _jnp.zeros_like(prob.b), cfg)
    os.environ["MBT_FUSED_PIPE"] = "0"
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    os.environ.pop("MBT_FUSED_PIPE", None)
    same = abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    print(json.dumps({"kernel": "pipe_bicgstab_fused",
                      "iters": int(res_f.n_iter),
                      "xla_iters": int(res_x.n_iter),
                      "relres": float(res_f.final_relres),
                      "trajectory_match": bool(same)}), flush=True)
    ok &= same and bool(res_f.converged)
    print(json.dumps({"chip_pallas_check": "OK" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
