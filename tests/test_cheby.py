"""Chebyshev polynomial preconditioning (ops/cheby.py) — iteration-count
wins are hardware-independent, so CPU asserts the real claim: same
answer, several times fewer iterations/reduction points for ~the same
SpMV work. (The reference has no preconditioner at all.)"""
import jax
import numpy as np
import pytest

from mpi_bicgstab_tpu.api import solve
from mpi_bicgstab_tpu.models.generators import transport_hard
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.ops.cheby import (ChebyPrecond, cheby_apply,
                                        estimate_bounds)
from mpi_bicgstab_tpu.utils.config import SolverConfig

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CSR = transport_hard(4096)
LO, HI = estimate_bounds(CSR)


def test_bounds_are_safe():
    # Gershgorin hi must bound the spectrum: |lambda| <= max row sum
    dense = CSR.to_dense()
    lam = np.linalg.eigvals(dense)
    assert np.abs(lam).max() <= HI * 1.001
    assert 0 < LO < HI


def test_parse_spec():
    assert ChebyPrecond.parse("none") is None
    p = ChebyPrecond.parse("cheby:4:0.5:100")
    assert (p.degree, p.lo, p.hi) == (4, 0.5, 100.0)
    assert ChebyPrecond.parse("cheby").degree == 8
    with pytest.raises(ValueError):
        ChebyPrecond.parse("ilu")
    with pytest.raises(ValueError):
        ChebyPrecond(degree=4).resolve()   # bounds unset, no matrix


def test_cheby_apply_linear():
    """p(A) is a fixed LINEAR operator (required for the exit transform
    x = p(A) y to commute with the solver's linearity): additivity and
    homogeneity to rounding."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(CSR.nrows))
    v = jnp.asarray(rng.standard_normal(CSR.nrows))
    spmv = lambda w: jnp.asarray(CSR.matvec(np.asarray(w)))  # noqa: E731
    pu = np.asarray(cheby_apply(spmv, u, 4, LO, HI))
    pv = np.asarray(cheby_apply(spmv, v, 4, LO, HI))
    puv = np.asarray(cheby_apply(spmv, u + 2.0 * v, 4, LO, HI))
    np.testing.assert_allclose(puv, pu + 2.0 * pv, rtol=1e-10,
                               atol=1e-12)


@pytest.mark.parametrize("method", ["bicgstab", "ca_bicgstab",
                                    "pipe_bicgstab", "pipe_bicgstab_rr"])
def test_cheby_cuts_iterations(method):
    prob = build_problem(CSR)
    cfg = SolverConfig(tol=1e-10, max_iter=3000)
    r0 = solve(prob.A, prob.b, method=method, cfg=cfg)
    r1 = solve(prob.A, prob.b, method=method, cfg=cfg,
               precond=ChebyPrecond(degree=8, lo=LO, hi=HI))
    assert bool(r1.converged)
    # >=4x fewer iterations (measured ~8x; margin for method variance)
    assert int(r1.n_iter) * 4 <= int(r0.n_iter)
    x = np.asarray(r1.x)[: CSR.nrows]
    assert np.abs(x - 1.0).max() < 1e-6
    # residual fields are the ORIGINAL system's (right preconditioning)
    r_true = CSR.matvec(x) - CSR.matvec(np.ones(CSR.nrows))
    nb = np.linalg.norm(CSR.matvec(np.ones(CSR.nrows)))
    assert np.linalg.norm(r_true) / nb < 1e-8


def test_cheby_df32():
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    prob = build_problem(CSR, dtype="df32")
    cfg = SolverConfig(tol=1e-9, max_iter=3000, dtype="df32")
    r1 = solve(prob.A, prob.b, method="bicgstab", cfg=cfg,
               precond=ChebyPrecond(degree=8, lo=LO, hi=HI))
    assert bool(r1.converged)
    x = df_to_f64(r1.x)[: CSR.nrows]
    assert np.abs(x - 1.0).max() < 1e-5


@requires_8
def test_cheby_distributed_matches():
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    part = partition_csr(CSR, 8)
    b = CSR.matvec(np.ones(CSR.nrows))
    cfg = SolverConfig(tol=1e-10, max_iter=3000)
    r0 = solve_distributed(part, b, method="bicgstab", cfg=cfg)
    r1 = solve_distributed(part, b, method="bicgstab", cfg=cfg,
                           precond=ChebyPrecond(degree=8, lo=LO, hi=HI))
    assert bool(r1.converged)
    assert int(r1.n_iter) * 4 <= int(r0.n_iter)
    x = np.asarray(r1.x)[: CSR.nrows]
    assert np.abs(x - 1.0).max() < 1e-6


@requires_8
def test_cheby_distributed_requires_bounds():
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    part = partition_csr(CSR, 8)
    b = CSR.matvec(np.ones(CSR.nrows))
    with pytest.raises(ValueError, match="bounds"):
        solve_distributed(part, b, precond=ChebyPrecond(degree=4))


def test_fused_chain_matches_xla(monkeypatch):
    """ops/pallas_cheby.cheby_chain (whole degree-d application as one
    window-resident Pallas pass) must match the XLA chain to f32
    rounding — multi-chunk config forced via a small VMEM budget."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.ops.layout import spmv
    from mpi_bicgstab_tpu.ops.pallas_cheby import (_LANES, _TR,
                                                   _pick_chunk,
                                                   cheby_chain)
    monkeypatch.setenv("MBT_CHEBY_VMEM_MB", "3")
    csr = transport_like(65536)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    A = prob.A
    G = A.n_rows // _LANES // _TR
    ch = _pick_chunk(G, A.n_diags, A.offsets, 4)
    assert 0 < ch < G, "fixture must exercise MULTIPLE chunks"
    lo, hi = estimate_bounds(csr)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows),
                    jnp.float32)
    ref = np.asarray(cheby_apply(lambda u: spmv(A, u), v, 4, lo, hi))
    out = np.asarray(cheby_chain(A.vals, v, A.offsets, 4, lo, hi,
                                 interpret=True))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-6, rel


def test_fused_chain_availability_gates():
    """available() must refuse: non-TPU backends, df32 vals, windows
    over budget, and halo-dominated windows (the efficiency gate)."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.ops import pallas_cheby
    csr = banded_random(128 * 512, [1, -1, 9, -9], seed=0)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    assert pallas_cheby.format_ok(prob.A, jnp.float32, 8)
    assert not pallas_cheby.format_ok(prob.A, jnp.float64, 8)
    # CPU backend: auto-dispatch always off
    assert not pallas_cheby.available(prob.A, jnp.float32, 8)


def test_fused_chain_covers_unaligned_sizes():
    """Regression: with n/128 not a multiple of the 64-row tile, the
    chain's grid used to round DOWN and leave the tail row-tiles of
    every output UNWRITTEN while format_ok rounded UP and approved the
    shape — exactly what the CLI's multiple=1024 padding produces
    (e.g. n=200704 -> nr=1568, 1568 % 64 = 32). The kernel now pads
    internally."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.ops.layout import spmv
    from mpi_bicgstab_tpu.ops.pallas_cheby import cheby_chain
    n = 36_864                       # nr = 288; 288 % 64 = 32 != 0
    csr = banded_random(n, [1, -1, 9, -9], seed=0)
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    A = prob.A
    assert (A.n_rows // 128) % 64 != 0, "fixture must be unaligned"
    lo, hi = estimate_bounds(csr)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows),
                    jnp.float32)
    ref = np.asarray(cheby_apply(lambda u: spmv(A, u), v, 4, lo, hi))
    out = np.asarray(cheby_chain(A.vals, v, A.offsets, 4, lo, hi,
                                 interpret=True))
    # the bug left the TAIL garbage — check it explicitly, then all
    tail = slice(-64 * 128, None)
    assert np.abs(out[tail] - ref[tail]).max() / np.abs(ref).max() < 2e-6
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6


def test_precond_degree_zero_rejected():
    with pytest.raises(ValueError, match="degree"):
        ChebyPrecond(degree=0, lo=1.0, hi=10.0)


def test_fused_chain_df_matches_xla():
    """df32 chain kernel (ops/pallas_cheby_df.py): one window-resident
    pass with in-kernel EFT arithmetic must match the XLA DF chain to
    DF rounding (same full-precision df_const coefficients), including
    an unaligned size and multiple chunks."""
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.ops.layout import spmv
    from mpi_bicgstab_tpu.ops.pallas_cheby_df import (_pick_chunk_df,
                                                      cheby_chain_df)
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    import jax.numpy as jnp
    csr = banded_random(36_864, [1, -1, 9, -9], seed=0)
    prob = build_problem(csr, dtype="df32", multiple=1024)
    A = prob.A
    lo, hi = estimate_bounds(csr)
    v = df_from_f64(np.random.default_rng(0).standard_normal(A.n_rows))
    ref = df_to_f64(cheby_apply(lambda u: spmv(A, u), v, 4, lo, hi))
    out = df_to_f64(cheby_chain_df(A.vals, v, A.offsets, 4, lo, hi,
                                   interpret=True))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    # CPU interpret: both sides run the f64-exact DF ops; on chip the
    # compiled EFT path is validated by tests/test_chip_kernels.py
    assert rel < 1e-9, rel
