"""Sigma-axis sharding (parallel/sigma.py): the shifted family over a
2-D (rows x sigma) mesh.

The reference's only parallel axis is the row partition; the shift
ladder is purely local per-rank work (shifted_switching_solver.c:
429-445). Sharding that ladder over a second mesh axis is the TPU-
native scaling lever SURVEY §2 sketches for very large sigma_len
("sharded over a second mesh axis"). These tests pin the defining
property: at the SAME row count, a sigma-sharded solve must reproduce
the 1-D run's trajectory (identical iteration counts and seed
switches; solutions equal to tight f64 tolerance — XLA:CPU may fuse
the differently-shaped slab updates with different FMA contraction, so
last-ulp equality is not guaranteed across compilations).
"""
import numpy as np
import pytest

import jax

from mpi_bicgstab_tpu.models.generators import banded_random
from mpi_bicgstab_tpu.parallel.driver import solve_shifted_distributed
from mpi_bicgstab_tpu.parallel.partition import partition_csr
from mpi_bicgstab_tpu.utils.config import ShiftedConfig

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")

SIGMA8 = np.array([0.0, 0.02, 0.05, 0.1, 0.2, 0.5, 1.0, 4.0])


def _fixture(seed_idx):
    csr = banded_random(1024, [1, -1, 9, -9], seed=2)
    b = csr.matvec(np.ones(csr.nrows)) \
        + SIGMA8[seed_idx] * np.ones(csr.nrows)
    return csr, b


@requires_8
@pytest.mark.parametrize("method,seed_idx", [
    ("shifted_bicgstab", 0),
    ("shifted_lopbicgstab", 4),
    ("shifted_pipe_lopbicgstab", 4),
    ("shifted_lopbicg", 4),
])
def test_sigma_sharded_matches_row_only(method, seed_idx):
    """rows=2 x sigma=4 must reproduce the rows=2 trajectory for every
    non-switching shifted method (same psum partition on the row axis
    -> identical dot products -> identical scalar recurrences)."""
    csr, b = _fixture(seed_idx)
    part = partition_csr(csr, 2)
    cfg = ShiftedConfig(tol=1e-10, max_iter=800, shift_block=0)
    kw = dict(seed=seed_idx, method=method, cfg=cfg)
    if method == "shifted_bicgstab":
        kw.pop("seed")
    r1 = solve_shifted_distributed(part, b, SIGMA8, **kw)
    r4 = solve_shifted_distributed(part, b, SIGMA8, **kw,
                                   sigma_devices=4)
    assert int(r1.n_iter) == int(r4.n_iter)
    assert bool(np.asarray(r4.stop_flags).all())
    x1, x4 = np.asarray(r1.x_set), np.asarray(r4.x_set)
    assert x1.shape == x4.shape
    np.testing.assert_allclose(x4, x1, atol=1e-12, rtol=1e-12)
    assert float(r4.true_relres) < 1e-8


@requires_8
@pytest.mark.parametrize("rows,groups", [(2, 4), (4, 2)])
def test_sigma_sharded_switching_bitexact(rows, groups):
    """The flagship across a REAL seed switch: the switch decision,
    history rebase and final solutions must be invariant to the sigma
    sharding (all switch logic runs on replicated scalars)."""
    seed_idx = 7   # decaying seed residual -> forces a mid-run switch
    csr, b = _fixture(seed_idx)
    part = partition_csr(csr, rows)
    cfg = ShiftedConfig(tol=1e-11, max_iter=800, shift_block=0)
    r1 = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg)
    rG = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg,
        sigma_devices=groups)
    assert int(r1.final_seed) != seed_idx, "fixture must switch seeds"
    assert int(rG.final_seed) == int(r1.final_seed)
    assert int(rG.n_iter) == int(r1.n_iter)
    assert bool(np.asarray(rG.stop_flags).all())
    np.testing.assert_allclose(np.asarray(rG.x_set),
                               np.asarray(r1.x_set),
                               atol=1e-12, rtol=1e-12)
    # every ladder system truly solved
    xG = np.asarray(rG.x_set)
    for j, sg in enumerate(SIGMA8):
        xj = xG[j][: csr.nrows]
        r = csr.matvec(xj) + sg * xj - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8, j


@requires_8
def test_sigma_sharded_switching_df32():
    """df32 ladder over the 2-D mesh: DF slabs shard leafwise; the DF
    arithmetic stays bit-identical (CPU computes EFTs through f64, so
    cross-compilation contraction differences do not apply)."""
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    seed_idx = 4
    csr, b = _fixture(seed_idx)
    part = partition_csr(csr, 2, dtype="df32")
    cfg = ShiftedConfig(tol=1e-9, max_iter=800, shift_block=0,
                        dtype="df32")
    r1 = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg)
    r4 = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg, sigma_devices=4)
    assert int(r4.n_iter) == int(r1.n_iter)
    assert int(r4.final_seed) == int(r1.final_seed)
    np.testing.assert_allclose(df_to_f64(r4.x_set), df_to_f64(r1.x_set),
                               atol=1e-12, rtol=1e-12)


@requires_8
def test_sigma_sharded_blocked_flush():
    """The blocked (deferred-MXU) shift updates compose with sigma
    sharding: each group flushes its LOCAL slice of the [S, L]
    coefficient matrices against its slab. Trajectory must match the
    blocked 1-D run (the coefficients are replicated; the flush is the
    same arithmetic on slab slices)."""
    seed_idx = 7
    csr, b = _fixture(seed_idx)
    part = partition_csr(csr, 2)
    cfg = ShiftedConfig(tol=1e-11, max_iter=800, shift_block=7)
    r1 = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg)
    rG = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg, sigma_devices=4)
    assert int(rG.n_iter) == int(r1.n_iter)
    assert int(rG.final_seed) == int(r1.final_seed) != seed_idx
    assert bool(np.asarray(rG.stop_flags).all())
    np.testing.assert_allclose(np.asarray(rG.x_set),
                               np.asarray(r1.x_set),
                               atol=1e-11, rtol=1e-11)
    xG = np.asarray(rG.x_set)
    for j, sg in enumerate(SIGMA8):
        xj = xG[j][: csr.nrows]
        r = csr.matvec(xj) + sg * xj - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8, j


@requires_8
def test_sigma_devices_must_divide_ladder():
    csr, b = _fixture(0)
    part = partition_csr(csr, 2)
    with pytest.raises(ValueError, match="not divisible"):
        solve_shifted_distributed(
            part, b, SIGMA8[:6], seed=0,
            method="shifted_lopbicgstab",
            cfg=ShiftedConfig(tol=1e-8, max_iter=50), sigma_devices=4)


@requires_8
def test_sigma_sharded_refine_composes():
    """--refine after a sigma-sharded solve: the [S, n] x_set arrives
    sharded (sigma, rows) and the row-mesh refine driver must accept
    it (jit resharding) and polish every shift to the true tolerance."""
    from mpi_bicgstab_tpu.parallel.driver import refine_shifted_distributed
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    seed_idx = 4
    csr, b = _fixture(seed_idx)
    part = partition_csr(csr, 2)
    cfg = ShiftedConfig(tol=1e-8, max_iter=800, shift_block=0)
    res = solve_shifted_distributed(
        part, b, SIGMA8, seed=seed_idx,
        method="shifted_lopbicg_switching", cfg=cfg, sigma_devices=4)
    x2, _k, rres = refine_shifted_distributed(
        part, b, SIGMA8, res.x_set,
        SolverConfig(tol=1e-11, max_iter=200))
    assert float(np.asarray(rres).max()) < 1e-11
    x2 = np.asarray(x2)
    for j, sg in enumerate(SIGMA8):
        xj = x2[j][: csr.nrows]
        r = csr.matvec(xj) + sg * xj - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10, j
