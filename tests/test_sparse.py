"""Unit tests: COO/CSR containers, conversions, ELL layout, SpMV.

Covers reference components C2-C4, C6, C20 against dense NumPy truth.
"""
import numpy as np
import pytest

from mpi_bicgstab_tpu.models.generators import (banded_random, poisson2d,
                                                poisson3d,
                                                random_diag_dominant)
from mpi_bicgstab_tpu.ops.ell import csr_to_ell, ell_to_dense
from mpi_bicgstab_tpu.ops.sparse import COOMatrix, CSRMatrix, coo_to_csr
from mpi_bicgstab_tpu.ops.spmv import ell_spmv, ell_spmv_shifted


def _rand_coo(n, m, nnz, seed=0, dup=False):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.standard_normal(nnz)
    if dup:
        rows[: nnz // 4] = rows[nnz // 4: nnz // 2]
        cols[: nnz // 4] = cols[nnz // 4: nnz // 2]
    return COOMatrix(rows.astype(np.int64), cols.astype(np.int64), vals, (n, m))


def test_coo_to_csr_matches_dense():
    coo = _rand_coo(37, 23, 300)
    csr = coo_to_csr(coo)
    np.testing.assert_allclose(csr.to_dense(), coo.to_dense(), atol=1e-14)
    assert csr.ptr[-1] == coo.nnz


def test_coo_to_csr_sum_duplicates():
    coo = _rand_coo(20, 20, 200, dup=True)
    csr = coo_to_csr(coo, sum_duplicates=True)
    np.testing.assert_allclose(csr.to_dense(), coo.to_dense(), atol=1e-14)
    # sorted, unique (row, col) pairs
    rows = np.repeat(np.arange(20), csr.row_lengths)
    keys = rows * 20 + csr.col
    assert (np.diff(keys) > 0).all()


def test_csr_matvec_matches_dense():
    coo = _rand_coo(50, 50, 400, seed=3)
    csr = coo_to_csr(coo)
    x = np.random.default_rng(1).standard_normal(50)
    np.testing.assert_allclose(csr.matvec(x), csr.to_dense() @ x, rtol=1e-12)


def test_shift_diagonal():
    csr = poisson2d(6)
    shifted = csr.shift_diagonal(0.25)
    np.testing.assert_allclose(shifted.to_dense(),
                               csr.to_dense() + 0.25 * np.eye(36), atol=0)


def test_shift_diagonal_missing_entry_raises():
    # matrix with an empty diagonal slot must hard-error (matrix.c:547-550)
    coo = COOMatrix(np.array([0, 1]), np.array([1, 0]),
                    np.array([1.0, 2.0]), (2, 2))
    csr = coo_to_csr(coo)
    with pytest.raises(ValueError, match="diagonal"):
        csr.shift_diagonal(1.0)


@pytest.mark.parametrize("gen", [
    lambda: poisson2d(7),
    lambda: poisson3d(4),
    lambda: banded_random(64, [1, -1, 5, -5], seed=2),
    lambda: random_diag_dominant(60, nnz_per_row=6, seed=4),
])
def test_ell_roundtrip(gen):
    csr = gen()
    A = csr_to_ell(csr)
    np.testing.assert_allclose(ell_to_dense(A), csr.to_dense(), atol=1e-14)
    assert A.tail_size == 0 or np.asarray(A.tail_vals).any() == False  # noqa: E712


def test_ell_width_cap_spills_to_tail():
    csr = random_diag_dominant(40, nnz_per_row=9, seed=7)
    A = csr_to_ell(csr, width=3)
    assert A.width == 3 and A.tail_size > 0
    np.testing.assert_allclose(ell_to_dense(A), csr.to_dense(), atol=1e-14)


@pytest.mark.parametrize("width", [None, 3])
def test_ell_spmv_matches_dense(width):
    csr = random_diag_dominant(48, nnz_per_row=7, seed=5)
    A = csr_to_ell(csr, width=width)
    x = np.random.default_rng(2).standard_normal(48)
    y = np.asarray(ell_spmv(A, x))
    np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-12)


def test_ell_spmv_shifted():
    csr = poisson2d(5)
    A = csr_to_ell(csr)
    x = np.random.default_rng(0).standard_normal(25)
    y = np.asarray(ell_spmv_shifted(A, x, 0.7))
    np.testing.assert_allclose(y, (csr.to_dense() + 0.7 * np.eye(25)) @ x,
                               rtol=1e-12)


def test_banded_tough_is_subdominant_but_solvable():
    """transport_hard / banded_tough: sub-dominant diagonal (realistic
    long convergence) that still converges under f64 BiCGStab."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_tough
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    csr = banded_tough(4096, [1, -1, 16, -16, 17, -17], seed=0,
                       dominance=0.6)
    d = np.abs(csr.to_dense())
    diag = np.diag(d)
    off = d.sum(1) - diag
    assert (diag < off).mean() > 0.9          # genuinely sub-dominant
    prob = build_problem(csr, dtype=jnp.float64)
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-10, max_iter=4000))
    assert bool(res.converged)
    assert int(res.n_iter) > 100              # meaningfully harder
    x = np.asarray(res.x)
    assert np.abs(x[: csr.nrows] - 1).max() < 1e-6


def test_generators_are_diag_dominant():
    for csr in [banded_random(50, [1, -1, 7, -7], seed=1),
                random_diag_dominant(50, 8, seed=1)]:
        d = csr.to_dense()
        diag = np.abs(np.diag(d))
        off = np.abs(d).sum(axis=1) - diag
        assert (diag > off).all()


def test_binary_csr_roundtrip(tmp_path):
    """save_csr/.npz load: bit-identical CSR, and load_csr routes on
    the extension (the CLI `convert` workflow)."""
    import numpy as np
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.ops.sparse import load_csr, save_csr
    csr = banded_random(256, [1, -1, 5, -5], seed=0)
    p = str(tmp_path / "a.npz")
    save_csr(p, csr)
    back = load_csr(p)
    np.testing.assert_array_equal(back.ptr, csr.ptr)
    np.testing.assert_array_equal(back.col, csr.col)
    np.testing.assert_array_equal(back.val, csr.val)
    assert back.shape == csr.shape
    import pytest
    with pytest.raises(ValueError, match="\\.npz"):
        save_csr(str(tmp_path / "a.mtx"), csr)
    bad = tmp_path / "junk.npz"
    np.savez(str(bad), foo=np.zeros(3))
    with pytest.raises(ValueError, match="not a CSR container"):
        load_csr(str(bad))


def test_csr_from_torch_matches_dense():
    import numpy as np
    torch = pytest.importorskip("torch")
    from mpi_bicgstab_tpu.ops.sparse import csr_from_torch
    rng = np.random.default_rng(0)
    d = rng.standard_normal((7, 5))
    d[d < 0.4] = 0.0
    for t in (torch.tensor(d).to_sparse_csr(),
              torch.tensor(d).to_sparse()):        # CSR and COO layouts
        csr = csr_from_torch(t)
        np.testing.assert_allclose(csr.to_dense(), d, rtol=0, atol=0)
