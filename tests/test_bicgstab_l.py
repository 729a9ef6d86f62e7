"""BiCGStab(l) (solvers/bicgstab_l.py) — the degree-l stabilized
variant, beyond the reference.

The headline property test is the skew-dominant fixture
(models/generators.skew_banded): A = 0.05 I + S with S skew has a
purely conjugate-pair spectrum, the documented failure class of the
degree-1 omega step — classic BiCGStab DIVERGES on it (true relres
grows to ~1e5) and the pipelined variant stalls at O(1), while l = 2
converges to the true tolerance. This is the same decoupling family
the true-residual gate catches (round-3 ROUND3.md).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import jax

from mpi_bicgstab_tpu.api import solve
from mpi_bicgstab_tpu.models.generators import banded_random, skew_banded
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.utils.config import SolverConfig

from oracles import bicgstab_l_oracle

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _problem(gen):
    csr = gen()
    return build_problem(csr, dtype=jnp.float64)


@pytest.mark.parametrize("method", ["bicgstab_l2", "bicgstab_l4"])
def test_converges_on_banded(method):
    prob = _problem(lambda: banded_random(240, [1, -1, 16, -16], seed=1))
    res = solve(prob.A, prob.b, method=method,
                cfg=SolverConfig(tol=1e-10, max_iter=800))
    assert bool(res.converged), method
    err = np.abs(np.asarray(res.x) - prob.exact_solution()).max()
    assert err < 1e-7
    assert float(res.true_relres) < 1e-8


def test_skew_dominant_classic_fails_l2_converges():
    """The motivating fixture: conjugate-pair spectrum. The classic
    family's recursive residual misbehaves (diverges or stalls far from
    the truth); BiCGStab(2) solves it."""
    prob = _problem(lambda: skew_banded(1024, seed=0))
    cfg = SolverConfig(tol=1e-10, max_iter=2000, restarts=0)
    classic = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert not bool(classic.converged)
    l2 = solve(prob.A, prob.b, method="bicgstab_l2", cfg=cfg)
    assert bool(l2.converged)
    assert float(l2.true_relres) < 1e-9
    err = np.abs(np.asarray(l2.x) - prob.exact_solution()).max()
    assert err < 1e-7
    assert int(l2.n_iter) < 1600   # converged with clear max_iter margin


@pytest.mark.parametrize("l", [2, 4])
def test_matches_numpy_oracle_trajectory(l):
    prob = _problem(lambda: banded_random(150, [1, -1, 12, -12], seed=5))
    cfg = SolverConfig(tol=1e-10, max_iter=500)
    res = solve(prob.A, prob.b, method=f"bicgstab_l{l}", cfg=cfg)
    x_o, k_o, hist_o = bicgstab_l_oracle(prob.csr.to_dense(),
                                         np.asarray(prob.b), l=l,
                                         tol=1e-10)
    assert abs(int(res.n_iter) - k_o) <= 2 * l
    # history is recorded once per outer cycle at slots l-1, 2l-1, ...
    h = np.asarray(res.history)
    got = h[l - 1::l]
    got = got[np.isfinite(got)]
    n = min(got.shape[0], hist_o.shape[0], 5)
    np.testing.assert_allclose(got[:n], hist_o[:n], rtol=1e-6)


def test_history_slots_and_n_iter_accounting():
    """n_iter counts classic-iteration equivalents (k += l per outer
    cycle); history holds one entry per cycle at index k+l-1, NaN in
    the unsampled slots."""
    prob = _problem(lambda: banded_random(240, [1, -1, 16, -16], seed=1))
    res = solve(prob.A, prob.b, method="bicgstab_l2",
                cfg=SolverConfig(tol=1e-10, max_iter=800))
    k = int(res.n_iter)
    assert k % 2 == 0
    h = np.asarray(res.history)
    assert np.isfinite(h[1:k:2]).all()
    assert np.isnan(h[0:k:2]).all()
    assert np.isnan(h[k:]).all()


@requires_8
def test_distributed_matches_single_device():
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    csr = banded_random(1024, [1, -1, 9, -9], seed=2)
    b = csr.matvec(np.ones(csr.nrows))
    part = partition_csr(csr, 8)
    cfg = SolverConfig(tol=1e-10, max_iter=800)
    res = solve_distributed(part, b, method="bicgstab_l2", cfg=cfg)
    assert bool(res.converged)
    prob = build_problem(csr, dtype=jnp.float64)
    r1 = solve(prob.A, prob.b, method="bicgstab_l2", cfg=cfg)
    assert abs(int(res.n_iter) - int(r1.n_iter)) <= 4
    err = np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-7


def test_df32_and_batched():
    """dtype-generic: DF slabs stack leafwise; vmap (solve_batched)
    composes because the body is pure lax."""
    from mpi_bicgstab_tpu.api import solve_batched
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = banded_random(512, [1, -1, 9, -9], seed=3)
    prob = build_problem(csr, dtype="df32")
    res = solve(prob.A, prob.b, method="bicgstab_l2",
                cfg=SolverConfig(tol=1e-9, max_iter=800,
                                 dtype=jnp.float32))
    assert bool(res.converged)
    assert np.abs(df_to_f64(res.x)[: csr.nrows] - 1.0).max() < 1e-6
    # batched, f64
    prob64 = build_problem(csr, dtype=jnp.float64)
    b = np.asarray(prob64.b)
    B = np.stack([b, 2.0 * b, 0.5 * b])
    rb = solve_batched(prob64.A, B, method="bicgstab_l2",
                       cfg=SolverConfig(tol=1e-10, max_iter=800,
                                        restarts=0))
    assert bool(np.asarray(rb.converged).all())
    X = np.asarray(rb.x)[:, : csr.nrows]
    np.testing.assert_allclose(X[0], np.ones(csr.nrows), atol=1e-7)
    np.testing.assert_allclose(X[1], 2 * np.ones(csr.nrows), atol=1e-7)
