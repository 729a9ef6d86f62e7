"""Smoke coverage for the benchmark runner (benchmarks/runner.py).

The reference's entire measurement apparatus (main_repeat.c, the
no-overlap section timers) exists to produce avg-time-per-iter and
scaling numbers; these tests pin the runner's CONTRACT — the slope
methodology produces positive finite times and the advertised keys —
on tiny problems, so the bench of record can't silently rot. Rates
themselves are not asserted (CPU timings are meaningless).
"""
import numpy as np
import pytest

from mpi_bicgstab_tpu.benchmarks import runner as R
from mpi_bicgstab_tpu.models.generators import banded_random


@pytest.fixture(scope="module")
def csr():
    # big enough that per-iteration work dominates host timer noise
    # (the slope sign is asserted below), small enough to stay fast
    return banded_random(8192, [1, -1, 20, -20], seed=0)


def test_bench_spmv_keys(csr):
    import jax.numpy as jnp
    r = R.bench_spmv(csr, jnp.float32, devices=1, iters=6)
    assert r["spmv_s"] > 0 and np.isfinite(r["spmv_s"])
    assert r["spmv_nnz_per_s"] == csr.nnz / r["spmv_s"]
    assert r["spmv_layout"] is not None


def test_bench_iteration_single_and_mesh(csr):
    import jax.numpy as jnp
    r1 = R.bench_iteration(csr, jnp.float32, devices=1,
                           method="bicgstab", iters=6)
    assert r1["time_per_iter_s"] > 0
    r2 = R.bench_iteration(csr, jnp.float32, devices=2,
                           method="bicgstab", iters=6)
    assert r2["time_per_iter_s"] > 0


def test_bench_scaling_sweep(csr):
    import jax.numpy as jnp
    r = R.bench_scaling(csr, jnp.float32, max_devices=2,
                        method="bicgstab", iters=6)
    assert r["scaling_devices"] == [1, 2]
    assert r["speedup_d1"] == 1.0
    assert r["time_per_iter_s_d2"] > 0
    assert r["speedup_d2"] > 0
    # honesty label: this run is on the virtual CPU mesh, not ICI
    assert r["scaling_fabric"].endswith("virtual-mesh")


def test_bench_shifted_iteration_runs(csr):
    r = R.bench_shifted_iteration(csr, "float32", sigma_len=32, seed=3,
                                  devices=1, iters=8, shift_block=0)
    assert r["time_per_iter_s"] > 0
    assert r["sigma_len"] == 32
    assert "sigma_devices" not in r   # only reported when sharded


def test_tol0_runs_exactly_max_iter_every_method():
    """The tol=0 BENCH CONTRACT (solvers/base.exact_iters): exactly
    max_iter iterations execute, no residual/NaN-breakdown early exit.

    Regression for a real bench poisoning: on an easy matrix the
    classic recurrences break down (dot_r -> NaN) a few iterations
    past convergence, and `NaN > 0` is False — so the tol=0 chain
    exited at a data-dependent ~24 iterations regardless of max_iter
    and the two-point slope recorded an impossible 19 us/iter on chip
    (BENCH round 3). The easy well-conditioned fixture here is the
    point: it converges in <10 iterations, so without the contract
    these 60-iteration runs would truncate."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.api import solve, solve_batched
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    csr = transport_like(6144)
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    for method in ("bicgstab", "ca_bicgstab", "pipe_bicgstab",
                   "pipe_bicgstab_rr", "bicgstab_l2"):
        cfg = SolverConfig(tol=0.0, max_iter=60, dtype=jnp.float32)
        r = solve(prob.A, prob.b, method=method, cfg=cfg)
        assert int(r.n_iter) == 60, (method, int(r.n_iter))
    # batched lanes must not freeze early either
    B = np.stack([np.asarray(prob.b)] * 3)
    rb = solve_batched(prob.A, B, method="bicgstab",
                       cfg=SolverConfig(tol=0.0, max_iter=60,
                                        dtype=jnp.float32))
    assert [int(k) for k in np.asarray(rb.n_iter)] == [60, 60, 60]


def test_tol0_shifted_runs_exactly_max_iter():
    import numpy as _np

    from mpi_bicgstab_tpu.api import solve_shifted
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig

    csr = transport_like(4096)
    import jax.numpy as jnp
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    sigma = (_np.arange(8) + 1) * (0.01 / 8)
    for method in ("shifted_bicgstab", "shifted_lopbicgstab",
                   "shifted_lopbicg_switching"):
        cfg = ShiftedConfig(tol=0.0, max_iter=24, dtype=jnp.float32)
        r = solve_shifted(prob.A, prob.b, sigma, seed=3, method=method,
                          cfg=cfg)
        # switching reports k-1 (reference off-by-one, quirk #7)
        n = int(_np.asarray(r.n_iter))
        assert n in (24, 23), (method, n)


def test_tol0_survives_exact_zero_residual():
    """The exact-zero breakdown lane the guard exists for: on an identity
    system every solver hits r = 0 after one step and dot_r underflows to
    exactly 0.0 — without the exact_iters gate the per-shift stop flags
    (and classic loop conds) would all flip and the loop would exit at a
    data-dependent iteration (ADVICE r3 medium)."""
    import jax.numpy as jnp
    import numpy as _np

    from mpi_bicgstab_tpu.api import solve, solve_shifted
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.sparse import CSRMatrix
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig, SolverConfig

    n = 1024
    csr = CSRMatrix(_np.arange(n + 1, dtype=_np.int64),
                    _np.arange(n, dtype=_np.int64),
                    _np.ones(n, dtype=_np.float32), (n, n))
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    eye, b = prob.A, prob.b
    r = solve(eye, b, method="bicgstab",
              cfg=SolverConfig(tol=0.0, max_iter=50, dtype=jnp.float32))
    assert int(r.n_iter) == 50

    sigma = (_np.arange(4) + 1) * 0.01
    for method in ("shifted_lopbicg", "shifted_lopbicg_switching"):
        cfg = ShiftedConfig(tol=0.0, max_iter=50, dtype=jnp.float32)
        rs = solve_shifted(eye, b, sigma, seed=1, method=method, cfg=cfg)
        ns = int(_np.asarray(rs.n_iter))
        assert ns in (50, 49), (method, ns)
    # blocked-MXU switching twin takes the same contract
    cfg = ShiftedConfig(tol=0.0, max_iter=50, dtype=jnp.float32,
                        shift_block=8)
    rs = solve_shifted(eye, b, sigma, seed=1,
                       method="shifted_lopbicg_switching", cfg=cfg)
    ns = int(_np.asarray(rs.n_iter))
    assert ns in (50, 49), ("blocked", ns)
