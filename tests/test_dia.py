"""DIA / hybrid layout tests (the TPU fast-path SpMV formats)."""
import numpy as np
import pytest

from mpi_bicgstab_tpu.models.generators import (banded_random, poisson2d,
                                                random_diag_dominant,
                                                transport_like)
from mpi_bicgstab_tpu.ops.dia import (DiaMatrix, analyze_diagonals,
                                      csr_to_dia, dia_spmv, dia_to_dense)
from mpi_bicgstab_tpu.ops.ell import EllMatrix
from mpi_bicgstab_tpu.ops.layout import HybridMatrix, build_operator, spmv


def test_analyze_diagonals_banded():
    csr = banded_random(200, [1, -1, 14, -14], seed=0)
    offs, cov = analyze_diagonals(csr)
    assert set(offs) == {0, 1, -1, 14, -14}
    assert cov == 1.0


def test_csr_to_dia_roundtrip():
    csr = poisson2d(9)
    offs, cov = analyze_diagonals(csr)
    dia, rem = csr_to_dia(csr, offs)
    assert rem is None
    np.testing.assert_allclose(dia_to_dense(dia), csr.to_dense(), atol=0)


def test_dia_spmv_matches_dense():
    csr = banded_random(300, [1, -1, 17, -17, 50, -50], seed=2)
    offs, _ = analyze_diagonals(csr)
    dia, rem = csr_to_dia(csr, offs)
    assert rem is None
    x = np.random.default_rng(0).standard_normal(300)
    np.testing.assert_allclose(np.asarray(dia_spmv(dia, x)),
                               csr.to_dense() @ x, rtol=1e-12)


def test_hybrid_split_and_spmv():
    # banded + random stragglers -> hybrid
    csr = random_diag_dominant(150, nnz_per_row=4, seed=1)
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr
    band = banded_random(150, [1, -1], seed=3)
    rows = np.concatenate([np.repeat(np.arange(150), band.row_lengths),
                           np.repeat(np.arange(150), csr.row_lengths)])
    cols = np.concatenate([band.col, csr.col])
    vals = np.concatenate([band.val, csr.val])
    mix = coo_to_csr(COOMatrix(rows, cols, vals, (150, 150)),
                     sum_duplicates=True)
    op = build_operator(mix, format="dia")
    assert isinstance(op, HybridMatrix)
    x = np.random.default_rng(4).standard_normal(150)
    np.testing.assert_allclose(np.asarray(spmv(op, x)), mix.to_dense() @ x,
                               rtol=1e-11)


def test_auto_routes_banded_to_dia():
    op = build_operator(banded_random(128, [1, -1, 9, -9], seed=0))
    assert isinstance(op, DiaMatrix)


def test_auto_routes_random_to_butterfly():
    # round 3: locality-free matrices get the butterfly-routed fast
    # path (ops/butterfly.py); gather-ELL only when not routable
    from mpi_bicgstab_tpu.ops.butterfly import ButterflyMatrix
    op = build_operator(random_diag_dominant(1000, nnz_per_row=8, seed=0))
    assert isinstance(op, ButterflyMatrix)


def test_transport_like_is_pure_dia():
    csr = transport_like(5000)
    op = build_operator(csr)
    assert isinstance(op, DiaMatrix)
    x = np.random.default_rng(1).standard_normal(5000)
    np.testing.assert_allclose(np.asarray(spmv(op, x)), csr.matvec(x),
                               rtol=1e-11)


@pytest.mark.parametrize("format", ["auto", "ell", "dia"])
def test_solver_works_on_every_layout(format):
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(240, [1, -1, 16, -16], seed=1)
    prob = build_problem(csr, format=format)
    res = solve(prob.A, prob.b, method="pipe_bicgstab",
                cfg=SolverConfig(tol=1e-10, max_iter=500))
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x) - prob.exact_solution()).max() < 1e-7
