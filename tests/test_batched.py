"""Batched multi-RHS solves (api.solve_batched) — beyond the reference
(one RHS per run): vmapped classic solvers where every iteration's band
multiply streams the matrix values once for the whole batch. JAX's
batched while_loop freezes converged lanes (select old carry), so each
lane's trajectory is BIT-IDENTICAL to its standalone solve."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from mpi_bicgstab_tpu.api import solve, solve_batched  # noqa: E402
from mpi_bicgstab_tpu.models.generators import (banded_random,  # noqa: E402
                                                transport_hard)
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.utils.config import SolverConfig  # noqa: E402

CSR = transport_hard(4096)
PROB = build_problem(CSR)


def _rhs_batch():
    b1 = CSR.matvec(np.ones(CSR.nrows))
    b2 = CSR.matvec(np.linspace(0, 1, CSR.nrows))
    b3 = np.zeros(CSR.nrows)
    b3[123] = 1.0
    return np.stack([b1, b2, b3])


@pytest.mark.parametrize("method", ["bicgstab", "pipe_bicgstab"])
def test_batched_lanes_match_standalone(method):
    """Heterogeneous difficulty: lanes converge at different k; each
    must freeze at ITS OWN n_iter with a bit-identical iterate."""
    B = _rhs_batch()
    cfg = SolverConfig(tol=1e-10, max_iter=3000, restarts=0)
    res = solve_batched(PROB.A, B, method=method, cfg=cfg)
    iters = np.asarray(res.n_iter)
    assert len(set(iters.tolist())) > 1, "fixture must be heterogeneous"
    for j in range(B.shape[0]):
        r1 = solve(PROB.A, B[j], method=method, cfg=cfg)
        assert int(res.n_iter[j]) == int(r1.n_iter)
        assert bool(res.converged[j]) == bool(r1.converged)
        np.testing.assert_array_equal(np.asarray(res.x)[j],
                                      np.asarray(r1.x))


def test_batched_df32():
    from mpi_bicgstab_tpu.ops.precision import DF, df_from_f64, df_to_f64
    prob = build_problem(CSR, dtype="df32")
    K = 3
    rng = np.random.default_rng(1)
    X = rng.standard_normal((K, CSR.nrows))
    B = df_from_f64(np.stack([CSR.matvec(X[j]) for j in range(K)]))
    # pad to the problem's padded width
    n = df_to_f64(prob.b).shape[0]
    pad = n - CSR.nrows
    B = DF(np.pad(np.asarray(B.hi), ((0, 0), (0, pad))),
           np.pad(np.asarray(B.lo), ((0, 0), (0, pad))))
    cfg = SolverConfig(tol=1e-11, max_iter=3000, dtype="df32")
    res = solve_batched(prob.A, B, method="bicgstab", cfg=cfg)
    assert np.asarray(res.converged).all()
    x = df_to_f64(res.x)
    for j in range(K):
        # error bound is kappa * relres (kappa ~1e4 on this fixture)
        assert np.abs(x[j][: CSR.nrows] - X[j]).max() < 1e-6


def test_batched_with_precond():
    from mpi_bicgstab_tpu.ops.cheby import ChebyPrecond, estimate_bounds
    lo, hi = estimate_bounds(CSR)
    B = _rhs_batch()
    cfg = SolverConfig(tol=1e-10, max_iter=3000)
    res = solve_batched(PROB.A, B, method="bicgstab", cfg=cfg,
                        precond=ChebyPrecond(degree=8, lo=lo, hi=hi))
    assert np.asarray(res.converged).all()
    assert int(np.asarray(res.n_iter).max()) < 120   # ~8x fewer
    x0 = np.asarray(res.x)[0][: CSR.nrows]
    assert np.abs(x0 - 1.0).max() < 1e-6


def test_batched_shape_errors():
    with pytest.raises(ValueError, match="k, n"):
        solve_batched(PROB.A, np.ones(64))
    with pytest.raises(ValueError, match="unknown method"):
        solve_batched(PROB.A, np.ones((2, 64)), method="nope")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batched_distributed():
    """vmap inside shard_map: per-shard [k, n_loc] slabs with batched
    psum reductions. Lanes must converge independently and match the
    truth; the preconditioner composes."""
    from mpi_bicgstab_tpu.ops.cheby import ChebyPrecond, estimate_bounds
    from mpi_bicgstab_tpu.parallel.driver import solve_batched_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, CSR.nrows))
    B = np.stack([CSR.matvec(X[j]) for j in range(3)])
    part = partition_csr(CSR, 8)
    cfg = SolverConfig(tol=1e-11, max_iter=3000)
    res = solve_batched_distributed(part, B, method="bicgstab", cfg=cfg)
    assert np.asarray(res.converged).all()
    assert len(set(np.asarray(res.n_iter).tolist())) > 1
    assert np.abs(np.asarray(res.x)[:, : CSR.nrows] - X).max() < 1e-6
    lo, hi = estimate_bounds(CSR)
    res2 = solve_batched_distributed(
        part, B, method="bicgstab", cfg=cfg,
        precond=ChebyPrecond(degree=8, lo=lo, hi=hi))
    assert np.asarray(res2.converged).all()
    assert int(np.asarray(res2.n_iter).max()) * 4 \
        < int(np.asarray(res.n_iter).max())
    assert np.abs(np.asarray(res2.x)[:, : CSR.nrows] - X).max() < 1e-6


def test_batched_lane_restarts():
    """Gate-failed lanes must re-enter individually (same refinement-
    restart policy as single-RHS): the pipe stall fixture in a batch
    comes back truly converged with restarts on."""
    csr = banded_random(512, [1, -1, 9, -9], seed=0)
    prob = build_problem(csr)
    # two gate-failing lanes (the second is the same system scaled, so
    # both are KNOWN rescuable; arbitrary RHS can decouple the pipe
    # recurrence beyond what a restart can fix at tol=1e-15)
    B = np.stack([np.asarray(prob.b), 2.0 * np.asarray(prob.b)])
    r0 = solve_batched(prob.A, B, method="pipe_bicgstab",
                       cfg=SolverConfig(tol=1e-15, max_iter=1000,
                                        restarts=0))
    assert not np.asarray(r0.converged).all()   # the stall
    r1 = solve_batched(prob.A, B, method="pipe_bicgstab",
                       cfg=SolverConfig(tol=1e-15, max_iter=1000))
    assert np.asarray(r1.converged).all()
    assert np.asarray(r1.true_relres).max() <= 1e-13
    x0 = np.asarray(r1.x)[0][: csr.nrows]
    assert np.abs(x0 - 1.0).max() < 1e-11
    x1 = np.asarray(r1.x)[1][: csr.nrows]
    assert np.abs(x1 - 2.0).max() < 1e-11


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batched_lane_restarts_distributed():
    csr = banded_random(512, [1, -1, 9, -9], seed=0)
    from mpi_bicgstab_tpu.parallel.driver import solve_batched_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    b = csr.matvec(np.ones(csr.nrows))
    B = np.stack([b, 2.0 * b])
    part = partition_csr(csr, 8)
    r0 = solve_batched_distributed(
        part, B, method="pipe_bicgstab",
        cfg=SolverConfig(tol=1e-15, max_iter=1000, restarts=0))
    assert not np.asarray(r0.converged).any()
    r1 = solve_batched_distributed(
        part, B, method="pipe_bicgstab",
        cfg=SolverConfig(tol=1e-15, max_iter=1000))
    assert np.asarray(r1.converged).all()
    assert np.abs(np.asarray(r1.x)[1][: csr.nrows] - 2.0).max() < 1e-11


def test_batched_fused_matches_vmap(monkeypatch):
    """The vals-stream-amortized batched solver
    (solvers/batched_fused.bicgstab_batched_fused via the
    api dispatch, kernel in interpret mode on CPU) must reproduce the
    vmap build's per-lane results: converged flags, n_iter within
    rounding slack, and solutions."""
    import jax.numpy as jnp

    csr = banded_random(8192, [1, -1, 12, -12], seed=7)
    prob32 = build_problem(csr, dtype=jnp.float32, multiple=8192)
    b1 = np.asarray(prob32.b)
    rng = np.random.default_rng(0)
    B = np.stack([b1, b1 * 0.5,
                  csr.matvec(rng.standard_normal(csr.nrows))]
                 ).astype(np.float32)
    cfg = SolverConfig(tol=1e-5, max_iter=80, dtype=jnp.float32,
                       restarts=0)
    monkeypatch.setenv("MBT_BATCHED_SPMV", "1")
    r_f = solve_batched(prob32.A, B, method="bicgstab", cfg=cfg)
    monkeypatch.setenv("MBT_BATCHED_SPMV", "0")
    cfg2 = SolverConfig(tol=1e-5, max_iter=81, dtype=jnp.float32,
                        restarts=0)   # defeat the jit cache (env gate)
    r_v = solve_batched(prob32.A, B, method="bicgstab", cfg=cfg2)
    assert np.asarray(r_f.converged).all()
    assert np.asarray(r_v.converged).all()
    ni_f, ni_v = np.asarray(r_f.n_iter), np.asarray(r_v.n_iter)
    assert (np.abs(ni_f - ni_v) <= 2).all(), (ni_f, ni_v)
    np.testing.assert_allclose(np.asarray(r_f.x), np.asarray(r_v.x),
                               atol=2e-3)
    # tol=0 bench contract holds for the fused batch too
    monkeypatch.setenv("MBT_BATCHED_SPMV", "1")
    cfg0 = SolverConfig(tol=0.0, max_iter=30, dtype=jnp.float32)
    r0 = solve_batched(prob32.A, B, method="bicgstab", cfg=cfg0)
    assert [int(v) for v in np.asarray(r0.n_iter)] == [30, 30, 30]


def test_batched_fully_fused_matches_vmap(monkeypatch):
    """The fully-fused batched phases (ops/pallas_fused_batched via
    solvers/batched_fused, interpret mode on CPU) must also reproduce
    the vmap build: converged flags, per-lane n_iter (including a lane
    that converges EARLY and freezes in-register), and solutions."""
    import jax.numpy as jnp

    csr = banded_random(8192, [1, -1, 12, -12], seed=7)
    prob32 = build_problem(csr, dtype=jnp.float32, multiple=8192)
    b1 = np.asarray(prob32.b)
    rng = np.random.default_rng(1)
    # lane 2's RHS is (nearly) a dominant eigenvector image, so its
    # Krylov iteration converges in ~1-2 steps and the lane freezes
    # while lanes 0/1 keep running — exercising the in-register masking
    v = rng.standard_normal(csr.nrows)
    for _ in range(40):
        v = csr.matvec(v)
        v /= np.linalg.norm(v)
    B = np.stack([csr.matvec(rng.standard_normal(csr.nrows)), b1,
                  csr.matvec(v)]).astype(np.float32)
    X0 = np.zeros_like(B)
    cfg = SolverConfig(tol=1e-5, max_iter=80, dtype=jnp.float32,
                       restarts=0)
    monkeypatch.setenv("MBT_BATCHED_SPMV", "1")
    monkeypatch.setenv("MBT_FUSED_BATCHED", "1")
    r_f = solve_batched(prob32.A, B, x0=X0, method="bicgstab", cfg=cfg)
    monkeypatch.setenv("MBT_BATCHED_SPMV", "0")
    monkeypatch.setenv("MBT_FUSED_BATCHED", "0")
    cfg2 = SolverConfig(tol=1e-5, max_iter=81, dtype=jnp.float32,
                        restarts=0)   # defeat the jit cache (env gate)
    r_v = solve_batched(prob32.A, B, x0=X0, method="bicgstab", cfg=cfg2)
    assert np.asarray(r_f.converged).all()
    assert np.asarray(r_v.converged).all()
    ni_f, ni_v = np.asarray(r_f.n_iter), np.asarray(r_v.n_iter)
    assert (np.abs(ni_f - ni_v) <= 2).all(), (ni_f, ni_v)
    # the near-solution lane must actually have frozen early
    assert ni_f[2] < ni_f[1], (ni_f, ni_v)
    np.testing.assert_allclose(np.asarray(r_f.x), np.asarray(r_v.x),
                               atol=2e-3)
    # tol=0 contract
    monkeypatch.setenv("MBT_BATCHED_SPMV", "1")
    monkeypatch.setenv("MBT_FUSED_BATCHED", "1")
    cfg0 = SolverConfig(tol=0.0, max_iter=30, dtype=jnp.float32)
    r0 = solve_batched(prob32.A, B, method="bicgstab", cfg=cfg0)
    assert [int(v) for v in np.asarray(r0.n_iter)] == [30, 30, 30]


def test_batched_fully_fused_multichunk_stash(monkeypatch):
    """The in-place p/s carry of the fused batch (input_output_aliases
    in ops/pallas_fused_batched.fused_k1b) relies on a VMEM stash to
    un-race the window DMA's leading halo rows once the grid runs more
    than one chunk. Laptop-scale problems get CH == G (single chunk),
    so force CH=1 on a 4-chunk problem and check the trajectory still
    matches the plain vmap build exactly."""
    import jax.numpy as jnp

    csr = banded_random(32768, [1, -1, 12, -12, 150, -150], seed=3)
    prob32 = build_problem(csr, dtype=jnp.float32, multiple=8192)
    rng = np.random.default_rng(5)
    B = np.stack([np.asarray(prob32.b),
                  csr.matvec(rng.standard_normal(csr.nrows))]
                 ).astype(np.float32)
    X0 = np.zeros_like(B)
    cfg = SolverConfig(tol=1e-5, max_iter=120, dtype=jnp.float32,
                       restarts=0)
    monkeypatch.setenv("MBT_FUSED_BATCHED", "1")
    monkeypatch.setenv("MBT_BATCHED_CH", "1")
    r_f = solve_batched(prob32.A, B, x0=X0, method="bicgstab", cfg=cfg)
    monkeypatch.delenv("MBT_BATCHED_CH")
    monkeypatch.setenv("MBT_FUSED_BATCHED", "0")
    monkeypatch.setenv("MBT_BATCHED_SPMV", "0")
    cfg2 = SolverConfig(tol=1e-5, max_iter=121, dtype=jnp.float32,
                        restarts=0)
    r_v = solve_batched(prob32.A, B, x0=X0, method="bicgstab", cfg=cfg2)
    ni_f, ni_v = np.asarray(r_f.n_iter), np.asarray(r_v.n_iter)
    assert (np.abs(ni_f - ni_v) <= 2).all(), (ni_f, ni_v)
    np.testing.assert_allclose(np.asarray(r_f.x), np.asarray(r_v.x),
                               atol=2e-3)
