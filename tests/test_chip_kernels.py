"""Compiled-Pallas chip CI (round-2 VERDICT #8): every hand-written
kernel, compiled by Mosaic ON THE REAL TPU, against its XLA reference.

Run:  MBT_TEST_PLATFORM=tpu MBT_X64=0 python -m pytest tests -m chip -q

x64 must be OFF (Mosaic rejects nonzero lane-shift rolls under x64 —
ops/pallas_spmv.py docstring); the default CPU suite covers the same
kernels in interpret mode, this file is what fails if the compiled
lowering rots. scripts/chip_pallas_check.py remains the script-style
wrapper around the same checks.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.chip,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs the real TPU backend"),
    pytest.mark.skipif(jax.config.jax_enable_x64,
                       reason="run with MBT_X64=0 (Mosaic x64 fence)"),
]


@pytest.fixture(scope="module")
def banded_prob():
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=5)
    return csr, build_problem(csr, dtype=jnp.float32, multiple=8192)


def test_dia_spmv_pallas_bit_exact(banded_prob):
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.ops.pallas_spmv import available, dia_spmv_pallas
    csr, prob = banded_prob
    A = prob.A
    assert available(A, block_rows=8192)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(prob.n),
                    jnp.float32)
    y_pallas = np.asarray(dia_spmv_pallas(A, x, block_rows=8192))
    y_xla = np.asarray(dia_spmv(A, x))
    assert float(np.abs(y_pallas - y_xla).max()) < 1e-5


def test_df_spmv_accuracy_vs_f64_on_chip(banded_prob):
    """dia_spmv_df / ell_spmv_df max-rel-error vs an f64 host product
    (round-4 ADVICE: the df_fma accumulation rewrite is invisible to
    the CPU suite — _cpu_exact_mode computes DF ops through f64 there,
    so only the compiled TPU kernels exercise the ~2^-48-per-term
    deferred-compensation arithmetic). Mirrors the accuracy check in
    scripts/r4_df_fma_spmv_ab.py as a pinned CI assertion."""
    from mpi_bicgstab_tpu.ops.dia import (analyze_diagonals, csr_to_dia,
                                          dia_spmv_df)
    from mpi_bicgstab_tpu.ops.ell import csr_to_ell
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    from mpi_bicgstab_tpu.ops.spmv import ell_spmv_df
    csr, _ = banded_prob
    x64 = np.random.default_rng(3).standard_normal(csr.nrows)
    y64 = csr.matvec(x64)
    ymax = np.abs(y64).max()
    x = df_from_f64(x64)

    offsets, _ = analyze_diagonals(csr)
    Adia, rem = csr_to_dia(csr, offsets, dtype="df32")
    assert rem is None or rem.nnz == 0
    y_dia = df_to_f64(jax.jit(dia_spmv_df)(Adia, x))
    assert float(np.abs(y_dia - y64).max() / ymax) < 1e-12

    Aell = csr_to_ell(csr, dtype="df32")
    y_ell = df_to_f64(jax.jit(ell_spmv_df)(Aell, x))
    assert float(np.abs(y_ell - y64).max() / ymax) < 1e-12


def test_window_spmv_f32():
    from mpi_bicgstab_tpu.models.generators import clustered_random
    from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv
    from mpi_bicgstab_tpu.ops.window_ell import csr_to_window_ell
    csr_w = clustered_random(4096, seed=2)
    W = csr_to_window_ell(csr_w, dtype=np.float32)
    xw = np.random.default_rng(1).standard_normal(csr_w.nrows)
    y = np.asarray(window_spmv(W, jnp.asarray(xw, jnp.float32)),
                   np.float64)
    y_ref = csr_w.matvec(xw)
    assert float(np.abs(y - y_ref).max() / np.abs(y_ref).max()) < 1e-5


def test_window_spmv_df32():
    from mpi_bicgstab_tpu.models.generators import clustered_random
    from mpi_bicgstab_tpu.ops.pallas_window_spmv import window_spmv_df
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    from mpi_bicgstab_tpu.ops.window_ell import csr_to_window_ell
    csr_w = clustered_random(4096, seed=2)
    Wdf = csr_to_window_ell(csr_w, dtype="df32")
    xw = np.random.default_rng(1).standard_normal(csr_w.nrows)
    ydf = df_to_f64(window_spmv_df(Wdf, df_from_f64(xw)))
    y_ref = csr_w.matvec(xw)
    assert float(np.abs(ydf - y_ref).max() / np.abs(y_ref).max()) < 1e-12


def test_fused_pipe_f32_trajectory(banded_prob, monkeypatch):
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe as fp
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr, prob = banded_prob
    cfg = SolverConfig(tol=1e-5, max_iter=100, dtype=jnp.float32)
    assert fp.available(prob.A, jnp.float32)
    res_f = fp.pipe_bicgstab_fused(prob.A, prob.b,
                                   jnp.zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_PIPE", "0")
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)


def test_fused_pipe_df32_trajectory(monkeypatch):
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df as fdf
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(16384, [1, -1, 40, -40], seed=7)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=150, dtype="df32")
    assert fdf.available(prob.A, cfg.dtype)   # canonical dtype engages
    res_f = fdf.pipe_bicgstab_fused_df(prob.A, prob.b,
                                       df_zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_DF", "0")
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_fused_pipe_df32_full_trajectory(monkeypatch):
    """Compiled FULLY-fused df32 pipe (SpMVs in-kernel,
    ops/pallas_fused_pipe_df2.py) vs the XLA build: same trajectory,
    df-class solution accuracy."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df2 as fdf2
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=7)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=200, dtype="df32")
    assert fdf2.available(prob.A, cfg.dtype)
    res_f = fdf2.pipe_bicgstab_fused_df_full(prob.A, prob.b,
                                             df_zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_DF2", "0")
    monkeypatch.setenv("MBT_FUSED_DF", "0")
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_shift_update_kernel_df32(monkeypatch):
    """Compiled df32 shift-update kernel: the df32 switching solve with
    the kernel engaged must match the pure-XLA build."""
    from mpi_bicgstab_tpu.api import solve_shifted
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.pallas_shift_update import available
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig
    csr = banded_random(2048, [1, -1, 10, -10], seed=11)
    prob = build_problem(csr, dtype="df32", multiple=1024)
    sigma = np.array([0.0, 0.02, 0.05, 0.1, 0.3, 0.5, 0.7, 1.0])
    assert available(len(sigma), prob.n, jnp.float32)
    cfg = ShiftedConfig(tol=1e-11, max_iter=600, dtype="df32")
    res_k = solve_shifted(prob.A, prob.b, sigma, seed=0,
                          method="shifted_lopbicg_switching", cfg=cfg)
    monkeypatch.setenv("MBT_FUSED_SHIFT", "0")
    res_x = solve_shifted(prob.A, prob.b, sigma, seed=0,
                          method="shifted_lopbicg_switching",
                          cfg=cfg.replace(max_iter=601))
    # (max_iter differs to defeat the jit cache under the env change;
    #  the run stops on tolerance well before either cap)
    assert abs(int(res_k.n_iter) - int(res_x.n_iter)) <= 2
    np.testing.assert_allclose(df_to_f64(res_k.x_set),
                               df_to_f64(res_x.x_set),
                               rtol=1e-8, atol=1e-9)


def test_butterfly_spmv_on_chip():
    """Compiled butterfly-routed SpMV (the uniform-random unstructured
    fast path) vs csr.matvec on a locality-free matrix."""
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import build_butterfly
    from mpi_bicgstab_tpu.ops.pallas_butterfly import (available,
                                                       butterfly_spmv)
    csr = random_diag_dominant(20480, nnz_per_row=8, seed=3)
    bfh = build_butterfly(csr, dtype=np.float32)
    bf = jax.tree_util.tree_map(jnp.asarray, bfh)
    assert available(bf, jnp.float32)
    x = np.random.default_rng(0).standard_normal(csr.nrows)
    y = np.asarray(butterfly_spmv(bf, jnp.asarray(x, jnp.float32)))
    y = y[: csr.nrows]
    y_ref = csr.matvec(x)
    assert float(np.abs(y - y_ref).max() / np.abs(y_ref).max()) < 1e-5


def test_blocked_switching_f32_on_chip():
    """Blocked MXU shift updates vs the per-iteration path, compiled."""
    from mpi_bicgstab_tpu.api import solve_shifted
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig
    csr = banded_random(2048, [1, -1, 10, -10], seed=11)
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0, 0.4, 2.0, 0.01])
    cfgB = ShiftedConfig(tol=1e-5, max_iter=500, dtype=jnp.float32,
                         shift_block=8)
    cfg0 = ShiftedConfig(tol=1e-5, max_iter=500, dtype=jnp.float32,
                         shift_block=0)
    rB = solve_shifted(prob.A, prob.b, sigma, seed=4,
                       method="shifted_lopbicg_switching", cfg=cfgB)
    r0 = solve_shifted(prob.A, prob.b, sigma, seed=4,
                       method="shifted_lopbicg_switching", cfg=cfg0)
    assert bool(np.asarray(rB.stop_flags).all())
    assert abs(int(rB.n_iter) - int(r0.n_iter)) <= 3
    np.testing.assert_allclose(np.asarray(rB.x_set),
                               np.asarray(r0.x_set), rtol=2e-4,
                               atol=2e-4)


def test_fused_classic_f32_trajectory(banded_prob, monkeypatch):
    """Compiled fused classic BiCGStab (ops/pallas_fused_classic.py)
    vs the XLA build: same trajectory."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_fused_classic as fcl
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr, prob = banded_prob
    cfg = SolverConfig(tol=1e-5, max_iter=100, dtype=jnp.float32)
    assert fcl.available(prob.A, jnp.float32)
    res_f = fcl.bicgstab_fused(prob.A, prob.b,
                               jnp.zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_CLASSIC", "0")
    res_x = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_fused_classic_df32_trajectory(monkeypatch):
    """Compiled df32 fused classic (ops/pallas_fused_classic_df.py)
    vs the XLA build: same trajectory, df-class solution accuracy."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_fused_classic_df as fcldf
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=17)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=200, dtype="df32")
    assert fcldf.available(prob.A, cfg.dtype)
    res_f = fcldf.bicgstab_fused_df(prob.A, prob.b,
                                    df_zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_CLASSIC_DF", "0")
    res_x = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_fused_ca_f32_trajectory(banded_prob, monkeypatch):
    """Compiled fused CA-BiCGStab (ops/pallas_fused_ca.py) vs the XLA
    build: same trajectory."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_fused_ca as fca
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr, prob = banded_prob
    cfg = SolverConfig(tol=1e-5, max_iter=100, dtype=jnp.float32)
    assert fca.available(prob.A, jnp.float32)
    res_f = fca.ca_bicgstab_fused(prob.A, prob.b,
                                  jnp.zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_CA", "0")
    res_x = solve(prob.A, prob.b, method="ca_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_fused_pipe_rr_f32_trajectory(banded_prob, monkeypatch):
    """Compiled RR-fused pipe (lax.cond between fused and replacement
    iterations) vs the XLA build: same trajectory with RR firing."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe as fp
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr, prob = banded_prob
    cfg = SolverConfig(tol=1e-5, max_iter=100, krr=5, nrr=3,
                       dtype=jnp.float32)
    assert fp.available(prob.A, jnp.float32)
    res_f = fp.pipe_bicgstab_rr_fused(prob.A, prob.b,
                                      jnp.zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_PIPE", "0")
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)


def test_fused_pipe_rr_df32_trajectory(monkeypatch):
    """Compiled df32 RR-fused pipe vs the XLA build with RR firing."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df2 as fdf2
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(16384, [1, -1, 40, -40], seed=25)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=200, krr=5, nrr=3,
                       dtype="df32")
    assert fdf2.available(prob.A, cfg.dtype)
    res_f = fdf2.pipe_bicgstab_rr_fused_df_full(
        prob.A, prob.b, df_zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_DF2", "0")
    monkeypatch.setenv("MBT_FUSED_DF", "0")
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_fused_ca_df32_trajectory(monkeypatch):
    """Compiled df32 fused CA (ops/pallas_fused_ca_df.py) vs the XLA
    build: same trajectory, df-class solution accuracy."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_fused_ca_df as fcadf
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=27)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=200, dtype="df32")
    assert fcadf.available(prob.A, cfg.dtype)
    res_f = fcadf.ca_bicgstab_fused_df(prob.A, prob.b,
                                       df_zeros_like(prob.b), cfg)
    monkeypatch.setenv("MBT_FUSED_CA_DF", "0")
    res_x = solve(prob.A, prob.b, method="ca_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_butterfly_spmv_df32():
    """Compiled df32 butterfly pipeline on chip: f64-class accuracy on
    a uniform-random locality-free matrix."""
    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops.butterfly import build_butterfly
    from mpi_bicgstab_tpu.ops.pallas_butterfly import (available_df,
                                                       butterfly_spmv_df)
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr = random_diag_dominant(8192, nnz_per_row=6, seed=5)
    B = build_butterfly(csr, dtype="df32")
    assert available_df(B, jnp.float32)
    x = np.random.default_rng(2).standard_normal(csr.nrows)
    y = df_to_f64(butterfly_spmv_df(B, df_from_f64(x)))[: csr.nrows]
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / np.abs(yr).max()
    assert rel < 1e-12, rel


def test_cheby_chain_on_chip(banded_prob):
    """Compiled fused Chebyshev chain (ops/pallas_cheby.py) vs the XLA
    chain, plus a full preconditioned solve with auto-dispatch on."""
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops import pallas_cheby
    from mpi_bicgstab_tpu.ops.cheby import (ChebyPrecond, cheby_apply,
                                            estimate_bounds)
    from mpi_bicgstab_tpu.ops.layout import spmv
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr, prob = banded_prob
    A = prob.A
    assert pallas_cheby.available(A, jnp.float32, 8)
    lo, hi = estimate_bounds(csr)
    v = jnp.asarray(np.random.default_rng(3).standard_normal(prob.n),
                    jnp.float32)
    ref = np.asarray(cheby_apply(lambda u: spmv(A, u), v, 8, lo, hi))
    out = np.asarray(pallas_cheby.cheby_chain(A.vals, v, A.offsets, 8,
                                              lo, hi))
    assert float(np.abs(out - ref).max() / np.abs(ref).max()) < 1e-5
    res = solve(prob.A, prob.b, method="bicgstab",
                cfg=SolverConfig(tol=1e-5, max_iter=800,
                                 dtype=jnp.float32),
                precond=ChebyPrecond(degree=8, lo=lo, hi=hi))
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max() < 1e-3


def test_cheby_chain_df_on_chip(banded_prob):
    """Compiled df32 fused Chebyshev chain vs the XLA DF chain: the
    in-kernel EFTs must preserve DF accuracy under Mosaic."""
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops import pallas_cheby_df
    from mpi_bicgstab_tpu.ops.cheby import cheby_apply, estimate_bounds
    from mpi_bicgstab_tpu.ops.layout import spmv
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_to_f64
    csr, _ = banded_prob
    prob = build_problem(csr, dtype="df32", multiple=8192)
    A = prob.A
    assert pallas_cheby_df.available(A, jnp.float32, 8)
    lo, hi = estimate_bounds(csr)
    v = df_from_f64(np.random.default_rng(5).standard_normal(A.n_rows))
    ref = df_to_f64(cheby_apply(lambda u: spmv(A, u), v, 8, lo, hi))
    out = df_to_f64(pallas_cheby_df.cheby_chain_df(
        A.vals, v, A.offsets, 8, lo, hi))
    rel = float(np.abs(out - ref).max() / np.abs(ref).max())
    assert rel < 1e-10, rel
