"""Jacobi symmetric scaling (ops/scale.py): exact transformation,
composability with RCM, and the payoff — fewer iterations on badly
scaled systems."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mpi_bicgstab_tpu.api import solve  # noqa: E402
from mpi_bicgstab_tpu.models.generators import banded_random  # noqa: E402
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.ops.scale import (jacobi_scale, scale_rhs,  # noqa: E402
                                        unscale_solution)
from mpi_bicgstab_tpu.ops.sparse import CSRMatrix  # noqa: E402
from mpi_bicgstab_tpu.utils.config import SolverConfig  # noqa: E402

RNG = np.random.default_rng(12)


def _badly_scaled(n=1024):
    """Diagonally dominant but with row/col magnitudes spanning 1e-4..1e4."""
    csr = banded_random(n, [1, -1, 9, -9], seed=3)
    s = 10.0 ** RNG.uniform(-4, 4, n)
    rows = np.repeat(np.arange(n), csr.row_lengths)
    val = csr.val * s[rows] * s[csr.col]
    return CSRMatrix(csr.ptr, csr.col, val, csr.shape)


def test_scaling_is_exact_transformation():
    csr = _badly_scaled(256)
    scaled, dis = jacobi_scale(csr)
    d = scaled.to_dense()
    # unit |diagonal| after equilibration
    np.testing.assert_allclose(np.abs(np.diag(d)), 1.0, rtol=1e-12)
    # A' == D^-1/2 A D^-1/2
    ref = np.diag(dis) @ csr.to_dense() @ np.diag(dis)
    np.testing.assert_allclose(d, ref, rtol=1e-12)
    # solution round trip: A x = b  <=>  A' y = D^-1/2 b, x = D^-1/2 y
    x = RNG.standard_normal(256)
    b = csr.matvec(x)
    y = np.linalg.solve(d, scale_rhs(b, dis))
    # the ORIGINAL system's conditioning (~1e8 from the deliberate
    # mis-scaling) bounds the recovery accuracy, not the transformation
    np.testing.assert_allclose(unscale_solution(y, dis), x,
                               rtol=0, atol=1e-5 * np.abs(x).max())


def test_scaling_reduces_iterations():
    csr = _badly_scaled()
    x_true = RNG.standard_normal(csr.nrows)
    b = csr.matvec(x_true)

    def run(mat, rhs):
        prob = build_problem(mat)
        from mpi_bicgstab_tpu.parallel.driver import pad_vector
        bd = jnp.asarray(pad_vector(rhs, prob.n))
        return solve(prob.A, bd, method="bicgstab",
                     cfg=SolverConfig(tol=1e-10, max_iter=2000))

    res_raw = run(csr, b)
    scaled, dis = jacobi_scale(csr)
    res_sc = run(scaled, scale_rhs(b, dis))
    assert bool(res_sc.converged)
    x = unscale_solution(np.asarray(res_sc.x)[: csr.nrows], dis)
    rel = np.linalg.norm(b - csr.matvec(x)) / np.linalg.norm(b)
    assert rel < 1e-7, rel
    if bool(res_raw.converged):
        assert int(res_sc.n_iter) <= int(res_raw.n_iter)


def test_scaling_handles_missing_diagonal():
    # row without a structural diagonal: scale 1.0, no crash
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr
    coo = COOMatrix(np.array([0, 0, 1]), np.array([0, 1, 0]),
                    np.array([4.0, 1.0, 2.0]), (2, 2))
    csr = coo_to_csr(coo)
    scaled, dis = jacobi_scale(csr)
    assert dis[1] == 1.0
    np.testing.assert_allclose(scaled.to_dense()[0, 0], 1.0)
