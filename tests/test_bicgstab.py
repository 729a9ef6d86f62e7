"""Convergence tests for the classic BiCGStab family, single device.

The minimum end-to-end slice (SURVEY §7 step 3): b = A*ones so the exact
solution is all-ones (reference main.c:109-117); assert convergence to
tolerance, agreement with the all-ones truth, and trajectory agreement
with the NumPy oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.api import solve
from mpi_bicgstab_tpu.models.generators import (banded_random, poisson2d,
                                                random_diag_dominant)
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.utils.config import SolverConfig

from oracles import bicgstab_oracle

METHODS = ["bicgstab", "ca_bicgstab", "pipe_bicgstab", "pipe_bicgstab_rr"]


def _problem(gen):
    csr = gen()
    return build_problem(csr, dtype=jnp.float64)


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("gen", [
    lambda: poisson2d(16),                                 # SPD, 256 rows
    lambda: banded_random(240, [1, -1, 16, -16], seed=1),  # unsymmetric
    lambda: random_diag_dominant(200, 8, seed=2),
])
def test_converges_to_all_ones(method, gen):
    prob = _problem(gen)
    cfg = SolverConfig(tol=1e-10, max_iter=800)
    res = solve(prob.A, prob.b, method=method, cfg=cfg)
    assert bool(res.converged), f"{method} did not converge"
    err = np.abs(np.asarray(res.x) - prob.exact_solution()).max()
    assert err < 1e-7, f"{method}: max err {err}"
    # true residual check, not just the recursive one
    true_r = np.asarray(prob.b) - prob.csr.matvec(np.asarray(res.x))
    rel = np.linalg.norm(true_r) / np.linalg.norm(np.asarray(prob.b))
    assert rel < 1e-8


def test_matches_numpy_oracle_trajectory():
    prob = _problem(lambda: banded_random(150, [1, -1, 12, -12], seed=5))
    cfg = SolverConfig(tol=1e-10, max_iter=500)
    res = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    x_o, k_o, hist_o = bicgstab_oracle(prob.csr.to_dense(),
                                       np.asarray(prob.b), tol=1e-10)
    assert abs(int(res.n_iter) - k_o) <= 2
    n = min(int(res.n_iter), k_o, 10)
    # early-trajectory agreement before rounding paths diverge
    np.testing.assert_allclose(np.asarray(res.history[:n]), hist_o[:n],
                               rtol=1e-6)


def test_history_shape_and_nan_padding():
    prob = _problem(lambda: poisson2d(8))
    cfg = SolverConfig(tol=1e-10, max_iter=300)
    res = solve(prob.A, prob.b, cfg=cfg)
    h = np.asarray(res.history)
    k = int(res.n_iter)
    assert h.shape == (300,)
    assert np.isfinite(h[:k]).all() and np.isnan(h[k:]).all()
    assert (np.diff(np.log10(h[:k]))[-3:] < 1).all()  # roughly decreasing


def test_zero_rhs_returns_immediately():
    prob = _problem(lambda: poisson2d(8))
    res = solve(prob.A, jnp.zeros_like(prob.b))
    assert int(res.n_iter) == 0


def test_rr_replacement_happens():
    # with krr small, RR iterations recompute the true residual; the
    # solve must still converge and agree with the truth
    prob = _problem(lambda: banded_random(220, [1, -1, 14, -14], seed=9))
    cfg = SolverConfig(tol=1e-11, max_iter=800, krr=10, nrr=5)
    res = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x) - prob.exact_solution()).max()
    assert err < 1e-7


def test_float32_path_runs():
    csr = poisson2d(12)
    prob = build_problem(csr, dtype=jnp.float32)
    cfg = SolverConfig(tol=1e-5, max_iter=400, dtype=jnp.float32)
    res = solve(prob.A, prob.b, cfg=cfg)
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x) - 1.0).max() < 1e-3


def test_true_residual_gates_converged():
    """Pipelined recurrences can DECOUPLE from the truth: on this
    fixture at tol=1e-15 the recursive residual contracts to ~1e-16
    while the true residual stalls at ~6e-2 (cond(A) is only ~6, so
    this is recurrence breakdown, not conditioning). `converged` must
    not report success there; classic BiCGStab on the same system is
    genuinely converged and must keep reporting success."""
    csr = banded_random(4096, [1, -1, 40, -40], seed=3)
    prob = build_problem(csr)
    # restarts=0: this test checks the GATE itself (the default
    # restarts would re-enter the solver and may rescue the solve —
    # that path is test_restart_rescues_gate_failure)
    cfg = SolverConfig(tol=1e-15, max_iter=1000, restarts=0)
    res_p = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert float(res_p.final_relres) < 1e-14      # est says "done"
    assert float(res_p.true_relres) > 1e-3        # truth says "no"
    assert not bool(res_p.converged)
    res_c = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert bool(res_c.converged)
    assert float(res_c.true_relres) < 1e-12
    assert np.abs(np.asarray(res_c.x) - 1.0).max() < 1e-10


def test_restart_rescues_gate_failure():
    """Default cfg.restarts: when the pipe recurrence hits tol but the
    true residual stalls at the attainable-accuracy floor (est 1e-16 /
    true ~2e-9 on this healthy fixture), the refinement restart must
    re-enter from the iterate and converge the TRUE residual."""
    csr = banded_random(512, [1, -1, 9, -9], seed=0)
    prob = build_problem(csr)
    cfg0 = SolverConfig(tol=1e-15, max_iter=1000, restarts=0)
    r0 = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg0)
    assert not bool(r0.converged)           # the stall this test is about
    assert float(r0.true_relres) > 1e-12
    cfg = SolverConfig(tol=1e-15, max_iter=1000)    # restarts default on
    res = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert bool(res.converged)
    assert float(res.true_relres) <= 1e-13          # gate: 100 * tol
    assert int(res.n_iter) > int(r0.n_iter)         # extra segment ran
    assert np.abs(np.asarray(res.x) - 1.0).max() < 1e-11
    # history stays relative to the ORIGINAL r0 across segments:
    # monotone scale, no jump back up to O(1) at the restart boundary
    h = np.asarray(res.history)
    h = h[np.isfinite(h)]
    assert h.shape[0] == int(res.n_iter) or h.shape[0] == cfg.max_iter
    assert h[int(r0.n_iter):].max() < 1e-8


def test_restart_leaves_breakdown_alone():
    """A max_iter exit (recurrence never hit tol) must NOT trigger
    restarts — re-entering cannot fix a stalled recurrence and would
    silently burn max_iter more iterations."""
    csr = banded_random(256, [1, -1, 7, -7], seed=1)
    prob = build_problem(csr)
    cfg = SolverConfig(tol=1e-15, max_iter=3)       # unreachable in 3
    res = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert not bool(res.converged)
    assert int(res.n_iter) == 3                     # exactly one segment
