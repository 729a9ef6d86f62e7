"""RCM bandwidth-reducing reordering (ops/reorder.py): a shuffled banded
matrix must come back to a narrow band, route onto the DIA fast path,
and solve to the ORIGINAL ordering's solution."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mpi_bicgstab_tpu.api import solve  # noqa: E402
from mpi_bicgstab_tpu.models.generators import (banded_random,  # noqa: E402
                                                random_diag_dominant)
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.ops.dia import DiaMatrix  # noqa: E402
from mpi_bicgstab_tpu.ops.layout import HybridMatrix  # noqa: E402
from mpi_bicgstab_tpu.ops.reorder import (_rcm_bfs, bandwidth,  # noqa: E402
                                          maybe_reorder, permute_csr,
                                          permute_vector, rcm_ordering,
                                          unpermute_vector)
from mpi_bicgstab_tpu.utils.config import SolverConfig  # noqa: E402

RNG = np.random.default_rng(7)


def _shuffled_banded(n=512, offsets=(1, -1, 5, -5)):
    csr = banded_random(n, list(offsets), seed=3)
    shuffle = RNG.permutation(n)
    return csr, permute_csr(csr, shuffle)


def test_permute_csr_roundtrip():
    csr, shuffled = _shuffled_banded()
    x = RNG.standard_normal(csr.nrows)
    # (PAP^T)(Px) == P(Ax)
    perm = RNG.permutation(csr.nrows)
    pa = permute_csr(csr, perm)
    lhs = pa.matvec(permute_vector(x, perm))
    rhs = permute_vector(csr.matvec(x), perm)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # unpermute inverts permute
    np.testing.assert_array_equal(
        unpermute_vector(permute_vector(x, perm), perm), x)


def test_rcm_restores_bandedness():
    csr, shuffled = _shuffled_banded()
    assert bandwidth(shuffled) > 50 * bandwidth(csr)
    perm = rcm_ordering(shuffled)
    bw = bandwidth(shuffled, perm)
    assert bw <= 4 * bandwidth(csr), (bw, bandwidth(csr))


def test_bfs_fallback_matches_scipy_quality():
    csr, shuffled = _shuffled_banded(n=256)
    bw_scipy = bandwidth(shuffled, rcm_ordering(shuffled))
    bw_bfs = bandwidth(shuffled, _rcm_bfs(shuffled))
    assert bw_bfs <= 2 * max(bw_scipy, 1)


def test_auto_reorder_routes_to_dia_and_solves():
    csr, shuffled = _shuffled_banded()
    prob = build_problem(shuffled, reorder="auto")
    assert prob.perm is not None
    assert isinstance(prob.A, (DiaMatrix, HybridMatrix))
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-12, max_iter=300))
    assert bool(res.converged)
    x = prob.unpermute(np.asarray(res.x))
    # all-ones is permutation invariant; also check against the
    # original-ordering solve
    assert np.abs(x[: csr.nrows] - 1.0).max() < 1e-8


def test_auto_reorder_skips_when_banded_or_hopeless():
    csr = banded_random(256, [1, -1, 9, -9], seed=1)
    out, perm = maybe_reorder(csr, "auto")
    assert perm is None and out is csr          # already DIA-routable
    rnd = random_diag_dominant(256, nnz_per_row=6, seed=2)
    out, perm = maybe_reorder(rnd, "auto")
    assert perm is None and out is rnd          # RCM cannot help


def test_reorder_mode_validation():
    csr = banded_random(64, [1, -1], seed=0)
    with pytest.raises(ValueError):
        maybe_reorder(csr, "bogus")
