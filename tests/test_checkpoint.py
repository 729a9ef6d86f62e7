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
