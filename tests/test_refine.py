"""Per-shift refinement (solvers/refine.py): the re-anchoring pass the
shifted recurrences lack. Validates recovery from simulated drift, the
end-to-end solve+refine pipeline (f64 and df32), and the CLI flag."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.api import (refine_shifted_solutions, solve_shifted)
from mpi_bicgstab_tpu.models.generators import banded_random
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.utils.config import ShiftedConfig, SolverConfig

SIGMA = np.array([0.0, 0.05, 0.2, 1.0])


def _true_errors(csr, sigma, x_set, b):
    errs = []
    for j, s in enumerate(sigma):
        xj = np.asarray(x_set[j], np.float64)
        r = csr.matvec(xj) + s * xj - b
        errs.append(np.linalg.norm(r) / np.linalg.norm(b))
    return np.array(errs)


def test_refine_recovers_perturbed_solutions():
    csr = banded_random(400, [1, -1, 12, -12], seed=5)
    prob = build_problem(csr)
    A = csr.to_dense()
    b = np.asarray(prob.b)
    xs = np.stack([np.linalg.solve(A + s * np.eye(csr.nrows), b)
                   for s in SIGMA])
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(xs + 1e-4 * rng.standard_normal(xs.shape))
    x2, k, relres = refine_shifted_solutions(
        prob.A, prob.b, SIGMA, x0,
        SolverConfig(tol=1e-12, max_iter=200))
    assert int(k) < 60                       # warm start pays off
    errs = _true_errors(prob.csr, SIGMA, np.asarray(x2), b)
    assert errs.max() < 1e-11, errs
    # reported relres IS the true residual (anchored by construction)
    np.testing.assert_allclose(np.asarray(relres), errs, rtol=1e-2,
                               atol=1e-14)


def test_refine_leaves_converged_rows_untouched():
    csr = banded_random(400, [1, -1, 12, -12], seed=5)
    prob = build_problem(csr)
    A = csr.to_dense()
    b = np.asarray(prob.b)
    xs = np.stack([np.linalg.solve(A + s * np.eye(csr.nrows), b)
                   for s in SIGMA])
    bad = xs.copy()
    bad[2] += 1e-3                           # only shift 2 drifted
    x2, k, relres = refine_shifted_solutions(
        prob.A, prob.b, SIGMA, jnp.asarray(bad),
        SolverConfig(tol=1e-12, max_iter=200))
    # untouched rows are BIT-identical (mask freezes them)
    for j in (0, 1, 3):
        np.testing.assert_array_equal(np.asarray(x2[j]), bad[j])
    errs = _true_errors(prob.csr, SIGMA, np.asarray(x2), b)
    assert errs[2] < 1e-11


def test_solve_then_refine_df32():
    """The production pipeline: df32 shifted solve (estimates may
    drift) + df32 refinement (true residuals guaranteed)."""
    csr = banded_random(512, [1, -1, 9, -9], seed=2)
    prob = build_problem(csr, dtype="df32", sigma_seed=0.0)
    sigma = np.linspace(0.0, 1.0, 8)
    cfg = ShiftedConfig(tol=1e-10, max_iter=600, dtype=jnp.float32)
    res = solve_shifted(prob.A, prob.b, sigma, seed=0,
                        method="shifted_lopbicg_switching", cfg=cfg)
    x2, k, relres = refine_shifted_solutions(
        prob.A, prob.b, sigma, res.x_set,
        SolverConfig(tol=1e-11, max_iter=300, dtype=jnp.float32))
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    b = np.asarray(df_to_f64(prob.b))
    errs = _true_errors(prob.csr, sigma, df_to_f64(x2), b)
    assert errs.max() < 5e-11, errs


def test_cli_refine_flag(tmp_path):
    from mpi_bicgstab_tpu.cli import main
    import json, contextlib, io
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["solve-shifted", "--matrix", "banded:4096",
                   "--sigma-len", "4", "--sigma-max", "1.0",
                   "--seed", "0", "--max-iter", "500", "--refine",
                   "--check-error", "--json"])
    assert rc == 0
    row = json.loads(out.getvalue().strip().splitlines()[-1])
    assert "refine_iters" in row
    assert row["max_true_relres_after_refine"] < 1e-9
    assert row["max_true_rel_error"] < 1e-9


def test_refine_distributed_mesh():
    """Distributed --refine (round-2 VERDICT #7): after a distributed
    shifted solve, the row-sharded refinement pass must bring every
    TRUE per-shift residual under tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from mpi_bicgstab_tpu.parallel.driver import (
        refine_shifted_distributed, solve_shifted_distributed)
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    csr = banded_random(1024, [1, -1, 12, -12], seed=9)
    part = partition_csr(csr, 8, dtype=np.float64)
    b = csr.matvec(np.ones(csr.nrows))
    cfg = ShiftedConfig(tol=1e-10, max_iter=800)
    res = solve_shifted_distributed(part, b, SIGMA, seed=0,
                                    method="shifted_lopbicg_switching",
                                    cfg=cfg)
    assert bool(np.asarray(res.stop_flags).all())
    rcfg = SolverConfig(tol=1e-10, max_iter=300)
    x2, k, relres = refine_shifted_distributed(part, b, SIGMA,
                                               res.x_set, rcfg)
    assert np.asarray(relres).max() < 1e-10
    errs = _true_errors(csr, SIGMA, np.asarray(x2)[:, : csr.nrows], b)
    assert errs.max() < 1e-9, errs
    # chunked path: chunk smaller than the ladder
    x3, k3, rel3 = refine_shifted_distributed(part, b, SIGMA,
                                              res.x_set, rcfg, chunk=2)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x2),
                               atol=1e-12)
