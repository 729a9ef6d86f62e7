"""Windowed-ELL layout + Pallas kernel (ops/window_ell.py,
ops/pallas_window_spmv.py): the unstructured fast path. Correctness via
interpret mode on CPU against dense; the solver integration via
layout auto-selection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.models.generators import clustered_random
from mpi_bicgstab_tpu.ops.layout import build_operator, spmv
from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv
from mpi_bicgstab_tpu.ops.window_ell import (WindowEllMatrix,
                                             csr_to_window_ell,
                                             window_ell_stats)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode suite is CPU-only (chip runs are benched "
           "separately; interpret over the axon relay hangs)")


def _mat(n=2048, seed=3, global_frac=0.003):
    return clustered_random(n, seed=seed, global_frac=global_frac)


def test_format_roundtrip_dense():
    csr = _mat()
    A = csr_to_window_ell(csr)
    assert isinstance(A, WindowEllMatrix)
    # every nnz is represented exactly once: stored + tail == dense
    x = np.random.default_rng(0).standard_normal(csr.nrows)
    y_ref = csr.matvec(x)
    y = window_spmv(A, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(y_ref).max())


def test_lane_injectivity_invariant():
    """Within each (slab, tile, sublane-row), stored lane classes are
    unique — the invariant the two-gather composition relies on."""
    csr = _mat(n=1024)
    A = csr_to_window_ell(csr)
    vals = np.asarray(A.vals)
    lanes = np.asarray(A.lane_idx)
    for w in range(A.width):
        for i in range(8):
            used = vals[w, 0, i] != 0.0
            lam = lanes[w, 0, i][used]
            assert len(np.unique(lam)) == lam.size


def test_window_stats_and_auto_selection():
    csr = _mat()
    stats = window_ell_stats(csr)
    assert stats["window_frac"] > 0.95
    op = build_operator(csr, format="auto", dtype=np.float32)
    assert isinstance(op, WindowEllMatrix)
    # the uniform-random matrix routes to the butterfly layout
    # (round 3; gather-ELL remains only the unroutable fallback)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import ButterflyMatrix
    csr_u = random_diag_dominant(2048, seed=1)
    op_u = build_operator(csr_u, format="auto", dtype=np.float32)
    assert isinstance(op_u, ButterflyMatrix)


def test_spmv_via_layout_dispatch():
    csr = _mat()
    op = build_operator(csr, format="window", dtype=np.float64)
    x = np.random.default_rng(1).standard_normal(csr.nrows)
    y = spmv(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), csr.matvec(x), rtol=1e-9)


def test_solver_on_clustered_matrix():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = _mat()
    prob = build_problem(csr, dtype=jnp.float64, format="window")
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-11, max_iter=300))
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x) - prob.exact_solution()).max()
    assert err < 1e-8


def test_spill_goes_to_tail():
    # crank global entries so the tail is exercised heavily
    csr = _mat(global_frac=0.2)
    A = csr_to_window_ell(csr)
    assert A.tail_size > 0
    x = np.random.default_rng(2).standard_normal(csr.nrows)
    y = window_spmv(A, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y), csr.matvec(x), rtol=1e-5,
                               atol=1e-4)


def test_distributed_window_solve_matches_single_device():
    """The windowed-ELL fast path across the 8-device mesh: per-shard
    diag blocks carry the window layout, long-range entries ride the
    offd all_gather ELL path; the distributed solve matches the
    single-device one."""
    import numpy as np
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    csr = clustered_random(8192, seed=5)
    part = partition_csr(csr, 8, dtype=np.float64)
    assert part.has_window, "expected the window layout to be selected"
    b = csr.matvec(np.ones(csr.nrows))
    cfg = SolverConfig(tol=1e-11, max_iter=400)
    res_d = solve_distributed(part, b, method="bicgstab", cfg=cfg)
    assert bool(res_d.converged)

    prob = build_problem(csr, dtype=jnp.float64, format="window")
    res_s = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert abs(int(res_d.n_iter) - int(res_s.n_iter)) <= 2
    err = np.abs(np.asarray(res_d.x) - 1.0).max()
    assert err < 1e-8, err


def test_distributed_window_spmv_exact():
    import numpy as np
    from mpi_bicgstab_tpu.parallel.driver import make_dist_spmv
    from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh
    from mpi_bicgstab_tpu.parallel.partition import partition_csr

    csr = clustered_random(8192, seed=6, global_frac=0.02)
    part = partition_csr(csr, 8, dtype=np.float64)
    assert part.has_window
    from mpi_bicgstab_tpu.parallel.driver import put_partitioned
    mesh = make_row_mesh(8)
    part = put_partitioned(part, mesh)
    f = make_dist_spmv(part, mesh)
    x = np.random.default_rng(0).standard_normal(part.n_global)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    xd = jax.device_put(x, NamedSharding(mesh, P("rows")))
    y = np.asarray(f(xd))
    y_ref = csr.matvec(x[: csr.nrows])
    np.testing.assert_allclose(y[: csr.nrows], y_ref, rtol=1e-9,
                               atol=1e-9 * np.abs(y_ref).max())


def test_window_spmv_df32_matches_f64():
    from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv_df
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = _mat()
    A = csr_to_window_ell(csr, dtype="df32")
    x = np.random.default_rng(4).standard_normal(csr.nrows)
    y = df_to_f64(window_spmv_df(A, df_from_f64(x), interpret=True))
    y_ref = csr.matvec(x)
    # DF unit roundoff ~2^-49; SpMV row sums stay within a few ulps
    np.testing.assert_allclose(y, y_ref, rtol=1e-13,
                               atol=1e-13 * np.abs(y_ref).max())


def test_df32_solver_on_clustered_matrix():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.window_ell import WindowEllMatrix
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = _mat()
    prob = build_problem(csr, dtype="df32")
    assert isinstance(prob.A, WindowEllMatrix)
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-11, max_iter=300,
                                 dtype=jnp.float32))
    assert bool(res.converged)
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    err = np.abs(df_to_f64(res.x) - prob.exact_solution()).max()
    assert err < 1e-8, err


def test_distributed_window_df32():
    import numpy as np
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = clustered_random(8192, seed=7)
    part = partition_csr(csr, 8, dtype="df32")
    assert part.has_window
    b = csr.matvec(np.ones(csr.nrows))
    res = solve_distributed(part, b, method="bicgstab",
                            cfg=SolverConfig(tol=1e-11, max_iter=400,
                                             dtype=jnp.float32))
    assert bool(res.converged)
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    err = np.abs(df_to_f64(res.x) - 1.0).max()
    assert err < 1e-8, err


def test_hub_row_falls_back_to_gather_ell():
    """A hub row with very many out-of-window entries must not crash
    auto-selection — the build's level-cap ValueError falls back to
    gather-ELL (round-2 code-review finding)."""
    import numpy as np
    from mpi_bicgstab_tpu.ops.ell import EllMatrix
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr
    csr = _mat(n=2048, global_frac=0.0)
    # inject one hub row with 100 spread-out entries
    rows = np.repeat(np.arange(csr.nrows), np.diff(csr.ptr))
    extra_cols = np.arange(0, 2000, 20, dtype=np.int64)
    rows_all = np.concatenate([rows, np.full(100, 7, dtype=np.int64)])
    cols_all = np.concatenate([csr.col, extra_cols])
    vals_all = np.concatenate([csr.val, np.full(100, 0.01)])
    csr2 = coo_to_csr(COOMatrix(rows_all, cols_all, vals_all, csr.shape),
                      sum_duplicates=True)
    op = build_operator(csr2, format="auto", dtype=np.float64)
    assert isinstance(op, EllMatrix)     # fell back, did not raise
    x = np.random.default_rng(0).standard_normal(csr2.nrows)
    y = spmv(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), csr2.matvec(x), rtol=1e-9)


def test_empty_tail_skips_spill_path():
    """A fully-windowed matrix builds a ZERO-size tail (round-2 review:
    the fixed 8-level floor made every SpMV run the spill path)."""
    csr = _mat(n=2048, global_frac=0.0)
    A = csr_to_window_ell(csr)
    if A.tail_size:
        # some over-width spill can legitimately remain; but with no
        # global entries the default width must usually absorb all
        assert A.tail_size < csr.nnz * 0.01
    x = np.random.default_rng(1).standard_normal(csr.nrows)
    y = window_spmv(A, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y), csr.matvec(x), rtol=1e-5,
                               atol=1e-5)


def test_tail_counts_exact_slicing():
    """tail_counts (static per-level real counts) must reproduce the
    padded-flat result exactly — this is the r4 fix for the windowed-ELL
    headline collapse (the [L, cap] rectangle padded the tail ~5x and
    the scatter-bound segment_sum over the padding cost ~2 ms at 1.6M;
    VERDICT r3 weak #2)."""
    import dataclasses
    csr = _mat(global_frac=0.2)
    A = csr_to_window_ell(csr)
    assert A.tail_size > 0 and A.tail_counts
    assert len(A.tail_counts) == A.tail_rows.shape[0]
    # counts are the real (nonzero-padded) entries per front-packed level
    tv = np.asarray(A.tail_vals)
    for d, c in enumerate(A.tail_counts):
        assert np.all(tv[d, c:] == 0)
    x = np.random.default_rng(3).standard_normal(csr.nrows)
    y_exact = window_spmv(A, jnp.asarray(x), interpret=True)
    # legacy/distributed fallback: same layout with counts erased
    A_pad = dataclasses.replace(A, tail_counts=())
    y_pad = window_spmv(A_pad, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y_exact), np.asarray(y_pad),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(y_exact), csr.matvec(x),
                               rtol=1e-5, atol=1e-4)
