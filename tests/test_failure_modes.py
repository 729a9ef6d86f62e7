"""Failure behavior: singular/breakdown systems must terminate promptly
and report non-convergence (NaN in the recurrence makes the while_loop
condition false), never hang — the reference simply aborts the MPI job
on any fault (SURVEY §5); we instead guarantee a clean result object.
Also fuzzes the native C++ .mtx parser against the pure-Python one."""
import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mpi_bicgstab_tpu.api import solve  # noqa: E402
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr  # noqa: E402
from mpi_bicgstab_tpu.utils.config import SolverConfig  # noqa: E402


def _singular_csr(n=64):
    # two identical rows -> singular; keep a structural diagonal
    i = np.arange(n, dtype=np.int64)
    rows = np.concatenate([i, i[:-1]])
    cols = np.concatenate([i, i[1:]])
    vals = np.concatenate([np.ones(n), np.ones(n - 1)])
    rows = np.concatenate([rows, [n - 1]])
    cols = np.concatenate([cols, [0]])
    vals = np.concatenate([vals, [0.0]])
    csr = coo_to_csr(COOMatrix(rows, cols, vals, (n, n)),
                     sum_duplicates=True)
    # make row 0 == row 1 exactly
    d = csr.to_dense()
    d[0] = d[1]
    rr, cc = np.nonzero(d)
    return coo_to_csr(COOMatrix(rr, cc, d[rr, cc], (n, n)))


@pytest.mark.parametrize("method", ["bicgstab", "pipe_bicgstab"])
def test_singular_terminates_nonconverged(method):
    csr = _singular_csr()
    prob = build_problem(csr)
    res = solve(prob.A, prob.b, method=method,
                cfg=SolverConfig(tol=1e-14, max_iter=500))
    # must RETURN (no hang); either honestly non-converged or the
    # residual broke down to NaN — never a false convergence claim
    rel = float(res.final_relres)
    if bool(res.converged):
        x = np.asarray(res.x, np.float64)
        b = np.asarray(prob.b, np.float64)
        true_rel = np.linalg.norm(b - prob.csr.matvec(x)) / np.linalg.norm(b)
        assert true_rel < 1e-6  # consistent solution of the singular system
    else:
        assert (not np.isfinite(rel)) or rel > 1e-14


def test_zero_diagonal_shift_errors_cleanly():
    csr = _singular_csr()
    from mpi_bicgstab_tpu.ops.sparse import CSRMatrix
    # remove the structural diagonal of row 3
    d = csr.to_dense()
    d[3, 3] = 0.0
    rr, cc = np.nonzero(d)
    c2 = coo_to_csr(COOMatrix(rr, cc, d[rr, cc], (csr.nrows, csr.nrows)))
    with pytest.raises(ValueError, match="diagonal"):
        c2.shift_diagonal(0.5)


def test_native_parser_matches_python():
    """Fuzz: random bodies through both parsers must agree bit-for-bit."""
    from mpi_bicgstab_tpu.io.mmio import read_matrix_market
    rng = np.random.default_rng(11)
    for trial in range(5):
        n = int(rng.integers(3, 40))
        nnz = int(rng.integers(1, n * n // 2 + 1))
        r = rng.integers(1, n + 1, nnz)
        c = rng.integers(1, n + 1, nnz)
        v = rng.standard_normal(nnz) * 10.0 ** rng.integers(-12, 12, nnz)
        lines = [f"%%MatrixMarket matrix coordinate real general",
                 f"% fuzz trial {trial}", f"{n} {n} {nnz}"]
        lines += [f"{ri} {ci} {vi:.17g}" for ri, ci, vi in zip(r, c, v)]
        text = "\n".join(lines) + "\n"
        out_nat = read_matrix_market(io.BytesIO(text.encode()),
                                     use_native=True)
        out_py = read_matrix_market(io.BytesIO(text.encode()),
                                    use_native=False)
        for a, b in zip(out_nat[:3], out_py[:3]):
            np.testing.assert_array_equal(a, b)
