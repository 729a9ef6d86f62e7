"""Butterfly-routed SpMV (ops/butterfly.py + ops/pallas_butterfly.py):
host routing correctness vs the numpy oracle and csr.matvec, the
chained-gather-semantics simulator, interpret-mode kernels, the XLA
fallback path, layout auto-selection, and an end-to-end solve."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpi_bicgstab_tpu.models.generators import random_diag_dominant
from mpi_bicgstab_tpu.ops.butterfly import (ButterflyMatrix,
                                            build_butterfly,
                                            butterfly_spmv_xla,
                                            butterfly_stats,
                                            simulate_numpy)


def _mk(n=8192, npr=8, seed=1):
    return random_diag_dominant(n, nnz_per_row=npr, seed=seed)


@pytest.mark.parametrize("n,npr", [(4096, 8), (20480, 12)])
def test_routing_simulator_matches_matvec(n, npr):
    csr = _mk(n, npr)
    bf = build_butterfly(csr)
    x = np.random.default_rng(0).standard_normal(n)
    y = simulate_numpy(bf, x)
    y_ref = csr.matvec(x)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-12
    # spill must stay tiny (the tail path is slow)
    assert bf.tail_count <= 0.005 * csr.nnz


def test_xla_path_matches_matvec():
    csr = _mk()
    bfh = build_butterfly(csr, dtype=np.float32)
    bf = jax.tree_util.tree_map(jnp.asarray, bfh)
    x = np.random.default_rng(0).standard_normal(csr.nrows)
    y = np.asarray(jax.jit(butterfly_spmv_xla)(
        bf, jnp.asarray(x, jnp.float32)))[: csr.nrows]
    y_ref = csr.matvec(x)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5


def test_pallas_interpret_matches_matvec():
    if jax.default_backend() != "cpu":
        pytest.skip("interpret run is CPU-only (chip runs are -m chip)")
    from mpi_bicgstab_tpu.ops.pallas_butterfly import butterfly_spmv
    csr = _mk(4096)
    bfh = build_butterfly(csr, dtype=np.float32)
    bf = jax.tree_util.tree_map(jnp.asarray, bfh)
    x = np.random.default_rng(0).standard_normal(csr.nrows)
    y = np.asarray(butterfly_spmv(bf, jnp.asarray(x, jnp.float32),
                                  interpret=True))[: csr.nrows]
    y_ref = csr.matvec(x)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5


def test_layout_auto_selects_butterfly():
    from mpi_bicgstab_tpu.ops.layout import build_operator, spmv
    csr = _mk(4096)
    op = build_operator(csr, dtype=np.float32)
    assert isinstance(op, ButterflyMatrix)
    x = np.random.default_rng(1).standard_normal(csr.nrows)
    y = np.asarray(spmv(op, jnp.asarray(x, jnp.float32)))
    assert y.shape[0] == csr.nrows
    y_ref = csr.matvec(x)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5


def test_stats_and_infeasible_fallback():
    stats = butterfly_stats(_mk(4096))
    assert 0 < stats["max_distinct"] <= 1024
    # a matrix with a row wider than max_width is rejected loudly
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr
    n = 2048
    base = _mk(n)               # unstructured (so auto skips DIA/window)
    brows = np.repeat(np.arange(n, dtype=np.int64), base.row_lengths)
    rows = np.concatenate([np.zeros(60, np.int64), brows])
    cols = np.concatenate([np.arange(60, dtype=np.int64) * 30 % n,
                           base.col])
    vals = np.ones(rows.size)
    wide = coo_to_csr(COOMatrix(rows, cols, vals, (n, n)),
                      sum_duplicates=True)
    with pytest.raises(ValueError):
        build_butterfly(wide, max_width=24)
    # and layout auto falls back to gather-ELL without raising
    from mpi_bicgstab_tpu.ops.ell import EllMatrix
    from mpi_bicgstab_tpu.ops.layout import build_operator
    op = build_operator(wide, dtype=np.float32)
    assert isinstance(op, EllMatrix)


def test_solve_on_butterfly_operator():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = _mk(4096)
    prob = build_problem(csr, dtype=jnp.float64, multiple=1024)
    assert isinstance(prob.A, ButterflyMatrix)
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-12, max_iter=200))
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-9, err


def test_numpy_fallback_router_matches(monkeypatch):
    """MBT_NATIVE_ROUTE=0 forces the vectorized-numpy round-based
    assigner; both routers must produce valid (simulator-exact)
    layouts."""
    import mpi_bicgstab_tpu.ops.native_route as nr
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import (build_butterfly,
                                                simulate_numpy)
    csr = random_diag_dominant(4096, nnz_per_row=6, seed=3)
    x = np.random.default_rng(1).standard_normal(csr.nrows)
    yr = csr.matvec(x)
    monkeypatch.setenv("MBT_NATIVE_ROUTE", "0")
    monkeypatch.setattr(nr, "_LIB", None)
    monkeypatch.setattr(nr, "_TRIED", True)
    B_np = build_butterfly(csr)
    y_np = simulate_numpy(B_np, x)[: csr.nrows]
    np.testing.assert_allclose(y_np, yr, rtol=1e-12)
    monkeypatch.setattr(nr, "_TRIED", False)
    monkeypatch.delenv("MBT_NATIVE_ROUTE")
    B_nat = build_butterfly(csr)
    y_nat = simulate_numpy(B_nat, x)[: csr.nrows]
    np.testing.assert_allclose(y_nat, yr, rtol=1e-12)


def test_df32_xla_pipeline_matches_matvec():
    """df32 butterfly: routing runs verbatim on hi/lo (movement is
    exact); DF multiply-accumulate + leveled tail give f64-class
    accuracy vs a float64 host reference."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import (build_butterfly,
                                                butterfly_spmv_xla_df)
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = random_diag_dominant(4096, nnz_per_row=6, seed=5)
    B = build_butterfly(csr, dtype="df32")
    x = np.random.default_rng(2).standard_normal(csr.nrows)
    y = df_to_f64(butterfly_spmv_xla_df(B, df_from_f64(x)))[: csr.nrows]
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / np.abs(yr).max()
    assert rel < 1e-13, rel


def test_df32_pallas_pipeline_interpret_matches():
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import build_butterfly
    from mpi_bicgstab_tpu.ops.pallas_butterfly import butterfly_spmv_df
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = random_diag_dominant(4096, nnz_per_row=6, seed=5)
    B = build_butterfly(csr, dtype="df32")
    x = np.random.default_rng(2).standard_normal(csr.nrows)
    y = df_to_f64(butterfly_spmv_df(B, df_from_f64(x),
                                    interpret=True))[: csr.nrows]
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / np.abs(yr).max()
    # interpret-mode XLA:CPU mangles composed EFT chains; the movement
    # and single-fma accumulation still land well under f32 error
    assert rel < 1e-10, rel


def test_df32_generic_spmv_dispatch():
    """auto layout for a uniform-random df32 matrix routes to
    butterfly, and the generic spmv returns a DF result matching the
    f64 host matvec."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import ButterflyMatrix
    from mpi_bicgstab_tpu.ops.layout import build_operator, spmv
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = random_diag_dominant(4096, nnz_per_row=6, seed=7)
    op = build_operator(csr, format="auto", dtype="df32")
    assert isinstance(op, ButterflyMatrix)
    x = np.random.default_rng(3).standard_normal(csr.nrows)
    y = df_to_f64(spmv(op, df_from_f64(x)))
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / np.abs(yr).max()
    assert rel < 1e-13, rel


# ---------------------------------------------------------------------------
# distributed butterfly (rectangular row-slab layouts over the mesh)
# ---------------------------------------------------------------------------

def test_distributed_butterfly_spmv_and_solve():
    """Uniform-random matrix across the 8-device mesh: per-shard
    RECTANGULAR butterfly layouts (local rows x all columns) over the
    allgathered iterate; distributed SpMV matches the host matvec and
    the distributed solve converges."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.parallel.driver import (make_dist_spmv,
                                                  put_partitioned,
                                                  put_vector,
                                                  solve_distributed)
    from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    n_dev = min(8, len(jax.devices()))
    csr = random_diag_dominant(8192, nnz_per_row=6, seed=9)
    part = partition_csr(csr, n_dev, format="butterfly")
    assert part.has_bfly and not part.has_ell
    mesh = make_row_mesh(n_dev)
    part_d = put_partitioned(part, mesh)
    x = np.random.default_rng(1).standard_normal(csr.nrows)
    y = np.asarray(make_dist_spmv(part_d, mesh)(
        put_vector(x, part, mesh)))[: csr.nrows]
    yr = csr.matvec(x)
    assert np.abs(y - yr).max() / np.abs(yr).max() < 1e-12
    b = csr.matvec(np.ones(csr.nrows))
    res = solve_distributed(part_d, b, method="bicgstab", mesh=mesh)
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max() < 1e-10


def test_distributed_butterfly_df32():
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    from mpi_bicgstab_tpu.parallel.driver import (put_partitioned,
                                                  solve_distributed)
    from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    n_dev = min(8, len(jax.devices()))
    csr = random_diag_dominant(8192, nnz_per_row=6, seed=10)
    part = partition_csr(csr, n_dev, dtype="df32", format="butterfly")
    assert part.has_bfly
    mesh = make_row_mesh(n_dev)
    part_d = put_partitioned(part, mesh)
    b = csr.matvec(np.ones(csr.nrows))
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    res = solve_distributed(part_d, b, method="bicgstab", mesh=mesh,
                            cfg=SolverConfig(tol=1e-11, max_iter=400,
                                             dtype=jnp.float32))
    assert bool(res.converged)
    err = np.abs(df_to_f64(res.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_partition_auto_routes_uniform_to_butterfly():
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    csr = random_diag_dominant(8192, nnz_per_row=6, seed=11)
    part = partition_csr(csr, 4, format="auto")
    assert part.has_bfly and not part.has_ell and not part.has_window


def test_tb_selection_divides_grids():
    """Round-4 kernel retune: K1/K2 take 256 windows per grid step and
    K3 the largest divisor of NR (pallas_butterfly._tb_windows /
    _tb_rows). The selected tile must always divide the grid extent —
    a non-divisor silently drops the trailing windows (grid floor
    division), which is the failure mode this pins."""
    from mpi_bicgstab_tpu.ops.pallas_butterfly import (_tb_rows,
                                                       _tb_windows)
    # P is always a multiple of 1024 with G = P/1024 odd (butterfly.py)
    for g in (1, 3, 25, 39):
        P = 1024 * g
        assert P % _tb_windows(P) == 0
    # NR is a multiple of 16 (n_pad rounds to 2048 = 16*128)
    for nr in (16, 32, 12520, 12528, 2048):
        assert nr % _tb_rows(nr) == 0
    assert _tb_windows(25600) == 256      # the 1.6M headline shape
    assert _tb_rows(12520) == 40
