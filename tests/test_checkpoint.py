"""Checkpoint/resume (utils/checkpoint.py): segmented solves restart
from the saved iterate exactly (classic-family restart is a plain
x0-warm-start), survive interruption, and refuse foreign checkpoints."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mpi_bicgstab_tpu.api import solve  # noqa: E402
from mpi_bicgstab_tpu.models.generators import banded_random  # noqa: E402
from mpi_bicgstab_tpu.models.problem import build_problem  # noqa: E402
from mpi_bicgstab_tpu.utils.checkpoint import (load_checkpoint,  # noqa: E402
                                               save_checkpoint,
                                               solve_with_checkpoints)
from mpi_bicgstab_tpu.utils.config import SolverConfig  # noqa: E402


def _setup():
    csr = banded_random(1024, [1, -1, 9, -9], seed=4, diag_boost=0.1)
    prob = build_problem(csr)
    cfg = SolverConfig(tol=1e-11, max_iter=500)

    def run(x0_host, budget, tol_seg=None):
        x0 = None if x0_host is None else jnp.asarray(x0_host, prob.b.dtype)
        c = cfg.replace(max_iter=budget)
        if tol_seg is not None:
            c = c.replace(tol=tol_seg)
        return solve(prob.A, prob.b, x0=x0, method="bicgstab", cfg=c)

    return csr, prob, run


def test_segmented_solve_converges(tmp_path):
    csr, prob, run = _setup()
    ref = run(None, 500)
    assert bool(ref.converged)
    need = int(ref.n_iter)
    assert need > 6  # must take several segments below

    path = str(tmp_path / "ck.npz")
    res, done, cum_rel = solve_with_checkpoints(run, path,
                                                segment_iters=15,
                                                max_iter=500,
                                                meta={"n": prob.n},
                                                tol=1e-11)
    assert bool(res.converged)
    assert cum_rel <= 1e-11
    x = np.asarray(res.x)
    assert np.abs(x[: csr.nrows] - 1).max() < 1e-7
    # restarts rebuild the Krylov space: some overhead allowed, not 3x
    assert done <= 3 * need, (done, need)
    assert load_checkpoint(path, expect={"n": prob.n})[1] == done


def test_resume_after_interruption(tmp_path):
    csr, prob, run = _setup()
    path = str(tmp_path / "ck.npz")
    # "interrupted": one 4-iteration segment only
    res1, done1, _ = solve_with_checkpoints(run, path, segment_iters=4,
                                            max_iter=4, meta={"n": prob.n},
                                            tol=1e-11)
    assert not bool(res1.converged) and done1 == 4
    # new process resumes from the file and finishes
    res2, done2, cum2 = solve_with_checkpoints(run, path, segment_iters=500,
                                               max_iter=500,
                                               meta={"n": prob.n},
                                               tol=1e-11)
    assert cum2 <= 1e-11
    assert bool(res2.converged)
    assert done2 > done1
    x = np.asarray(res2.x)
    assert np.abs(x[: csr.nrows] - 1).max() < 1e-7


def test_checkpoint_metadata_guard(tmp_path):
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, jnp.zeros((8,)), 3, {"n": 8})
    assert load_checkpoint(path, expect={"n": 8})[1] == 3
    with pytest.raises(ValueError):
        load_checkpoint(path, expect={"n": 16})


def test_df_checkpoint_roundtrip(tmp_path):
    from mpi_bicgstab_tpu.ops.precision import df_from_f64
    path = str(tmp_path / "ck.npz")
    v = np.linspace(0, 1, 7) + 1e-12
    save_checkpoint(path, df_from_f64(v), 1, {"n": 7})
    x, done, header = load_checkpoint(path)
    assert header["kind"] == "df"
    np.testing.assert_allclose(x, v, rtol=0, atol=1e-15)


# ---------------------------------------------------------------------------
# full-carry checkpoint of the seed-switching shifted solver (round 2):
# a segmented run must be BIT-IDENTICAL to an uninterrupted one
# ---------------------------------------------------------------------------

def _switching_setup(dtype="float64"):
    from mpi_bicgstab_tpu.models.generators import banded_random
    csr = banded_random(256, [1, -1, 10, -10], seed=7)
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    prob = build_problem(csr, dtype=dtype, sigma_seed=float(sigma[4]))
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig
    cfg = ShiftedConfig(tol=1e-11, max_iter=800,
                        dtype=jnp.float32 if dtype == "df32"
                        else prob.b.dtype)
    return prob, sigma, cfg


@pytest.mark.parametrize("dtype", ["float64", "df32"])
def test_switching_carry_resume_bit_identical(dtype, tmp_path):
    """Interrupt the seed-switching solve mid-run (across a seed switch,
    seed=4 on a wide ladder switches early), resume from the saved
    carry in a fresh call, and require BIT equality with the
    uninterrupted solve — the carry is the complete solver state."""
    from mpi_bicgstab_tpu.api import (solve_shifted,
                                      solve_shifted_checkpointed)
    from mpi_bicgstab_tpu.ops.precision import is_df
    prob, sigma, cfg = _switching_setup(dtype)
    ref = solve_shifted(prob.A, prob.b, sigma, seed=4,
                        method="shifted_lopbicg_switching", cfg=cfg)
    assert bool(np.asarray(ref.stop_flags).all())
    assert int(ref.n_iter) > 12   # several segments below

    path = str(tmp_path / "sw.npz")
    meta = {"n": int(prob.n), "sigma_len": int(sigma.size)}
    # run ONLY two short segments, then abandon (simulated preemption)
    from mpi_bicgstab_tpu.solvers.switching import init_switching_carry
    from mpi_bicgstab_tpu.api import _switching_segment_jit
    from mpi_bicgstab_tpu.parallel.comm import Comm
    from mpi_bicgstab_tpu.ops.precision import df_from_f64
    sig_dev = (df_from_f64(sigma) if dtype == "df32"
               else jnp.asarray(sigma, prob.b.dtype))
    carry = init_switching_carry(prob.b, sig_dev, 4, cfg,
                                 comm=Comm(None))
    from mpi_bicgstab_tpu.utils.checkpoint import save_carry
    _, carry = _switching_segment_jit(prob.A, prob.b, sig_dev, cfg,
                                      carry, jnp.int32(7))
    save_carry(path, carry, meta)

    # fresh resume (fresh template, carry only from disk)
    res, total = solve_shifted_checkpointed(
        prob.A, prob.b, sigma, seed=4, cfg=cfg, path=path,
        segment_iters=4, meta=meta)
    assert total == int(ref.n_iter)
    assert int(res.final_seed) == int(ref.final_seed)

    def leaves(x):
        if is_df(x):
            return [np.asarray(x.hi), np.asarray(x.lo)]
        return [np.asarray(x)]
    for a, b_ in zip(leaves(ref.x_set), leaves(res.x_set)):
        np.testing.assert_array_equal(a, b_)
    np.testing.assert_array_equal(np.asarray(ref.shift_relres),
                                  np.asarray(res.shift_relres))
    hist_r = np.asarray(ref.history)
    hist_s = np.asarray(res.history)
    np.testing.assert_array_equal(hist_r[~np.isnan(hist_r)],
                                  hist_s[~np.isnan(hist_s)])


def test_switching_carry_refuses_mismatch(tmp_path):
    from mpi_bicgstab_tpu.api import solve_shifted_checkpointed
    prob, sigma, cfg = _switching_setup()
    path = str(tmp_path / "sw.npz")
    res, _ = solve_shifted_checkpointed(
        prob.A, prob.b, sigma, seed=4, cfg=cfg, path=path,
        segment_iters=10, meta={"sigma_len": 5})
    with pytest.raises(ValueError, match="refusing to resume"):
        solve_shifted_checkpointed(
            prob.A, prob.b, sigma, seed=4, cfg=cfg, path=path,
            segment_iters=10, meta={"sigma_len": 6})
    # and a different max_iter changes the archive SHAPES -> structure
    # guard must catch it
    cfg2 = cfg.replace(max_iter=cfg.max_iter + 1)
    with pytest.raises(ValueError, match="structure|leaf"):
        solve_shifted_checkpointed(
            prob.A, prob.b, sigma, seed=4, cfg=cfg2, path=path,
            segment_iters=10, meta={"sigma_len": 5})


def test_switching_checkpoint_completed_run_short_circuits(tmp_path):
    """Re-invoking after convergence must not iterate further: the
    zero-length segment path returns the finished result."""
    from mpi_bicgstab_tpu.api import solve_shifted_checkpointed
    prob, sigma, cfg = _switching_setup()
    path = str(tmp_path / "sw.npz")
    meta = {"sigma_len": 5}
    res1, it1 = solve_shifted_checkpointed(
        prob.A, prob.b, sigma, seed=4, cfg=cfg, path=path,
        segment_iters=50, meta=meta)
    assert bool(np.asarray(res1.stop_flags).all())
    res2, it2 = solve_shifted_checkpointed(
        prob.A, prob.b, sigma, seed=4, cfg=cfg, path=path,
        segment_iters=50, meta=meta)
    assert it2 == it1
    np.testing.assert_array_equal(np.asarray(res1.x_set),
                                  np.asarray(res2.x_set))
