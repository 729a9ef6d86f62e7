"""Per-shift stopping + seed-switching solver tests (reference flagship,
shifted_switching_solver.c). Ground truth: dense LU of every shifted
system."""
import numpy as np
import pytest

from mpi_bicgstab_tpu.api import solve_shifted
from mpi_bicgstab_tpu.models.generators import banded_random
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.utils.config import ShiftedConfig

from oracles import shifted_bicgstab_oracle


def _problem(n=120, seed_val=11, sigma_seed=0.0):
    csr = banded_random(n, [1, -1, 10, -10], seed=seed_val)
    return csr, build_problem(csr, sigma_seed=sigma_seed)


def _true_errors(csr, sigma, x_set, b):
    errs = []
    for j, s in enumerate(sigma):
        xj = np.asarray(x_set[j])
        r = csr.matvec(xj) + s * xj - b
        errs.append(np.linalg.norm(r) / np.linalg.norm(b))
    return np.array(errs)


SIGMA = np.array([0.0, 0.02, 0.05, 0.1, 0.3])


@pytest.mark.parametrize("seed", [0, 2, 4])
def test_lopbicg_per_shift_stopping(seed):
    csr, prob = _problem()
    cfg = ShiftedConfig(tol=1e-11, max_iter=800)
    res = solve_shifted(prob.A, prob.b, SIGMA, seed=seed,
                        method="shifted_lopbicg", cfg=cfg)
    assert bool(np.asarray(res.stop_flags).all()), "not all shifts converged"
    errs = _true_errors(prob.csr, SIGMA, np.asarray(res.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-8, errs


def test_lopbicg_matches_unstopped_variant():
    # with per-shift stopping, solutions must still match the LU truth
    # as well as the non-stopping variant does
    csr, prob = _problem()
    cfg = ShiftedConfig(tol=1e-11, max_iter=800)
    r1 = solve_shifted(prob.A, prob.b, SIGMA, seed=0,
                       method="shifted_lopbicg", cfg=cfg)
    x_lu = shifted_bicgstab_oracle(prob.csr.to_dense(),
                                   np.asarray(prob.b), SIGMA)
    np.testing.assert_allclose(np.asarray(r1.x_set), x_lu, atol=1e-7)


@pytest.mark.parametrize("seed", [4, 2])
def test_switching_solves_all_systems(seed):
    # wide ladder: large sigma systems converge much faster, so a seed at
    # the top of the ladder converges first and triggers switching
    csr, prob = _problem()
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    cfg = ShiftedConfig(tol=1e-11, max_iter=1000)
    res = solve_shifted(prob.A, prob.b, sigma, seed=seed,
                        method="shifted_lopbicg_switching", cfg=cfg)
    assert bool(np.asarray(res.stop_flags).all())
    errs = _true_errors(prob.csr, sigma, np.asarray(res.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-8, errs


def test_switching_actually_switches():
    csr, prob = _problem()
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    cfg = ShiftedConfig(tol=1e-11, max_iter=1000)
    res = solve_shifted(prob.A, prob.b, sigma, seed=4,
                        method="shifted_lopbicg_switching", cfg=cfg)
    assert int(res.final_seed) != 4, "expected at least one seed switch"
    assert bool(np.asarray(res.stop_flags).all())


def test_switching_beats_fixed_seed_iterations():
    # the reason switching exists: a fixed easy seed stalls the hard
    # shifts; switching re-seeds and should need no MORE iterations
    csr, prob = _problem()
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    cfg = ShiftedConfig(tol=1e-11, max_iter=1000)
    res_fix = solve_shifted(prob.A, prob.b, sigma, seed=4,
                            method="shifted_lopbicg", cfg=cfg)
    res_sw = solve_shifted(prob.A, prob.b, sigma, seed=4,
                           method="shifted_lopbicg_switching", cfg=cfg)
    assert bool(np.asarray(res_sw.stop_flags).all())
    if bool(np.asarray(res_fix.stop_flags).all()):
        assert int(res_sw.n_iter) <= int(res_fix.n_iter) + 50


def test_switching_512_ladder_driver_config():
    # the main_shifted.c driver config (:13-14,:95-100): 512 shifts
    # sigma_i=(i+1)*0.01/512, seed 255, b=(A+sigma_seed I)*ones
    csr = banded_random(96, [1, -1, 8, -8], seed=3)
    sigma = (np.arange(1, 513)) * (0.01 / 512)
    prob = build_problem(csr, sigma_seed=sigma[255])
    cfg = ShiftedConfig(tol=1e-10, max_iter=500)
    res = solve_shifted(prob.A, prob.b, sigma, seed=255,
                        method="shifted_lopbicg_switching", cfg=cfg)
    assert bool(np.asarray(res.stop_flags).all())
    errs = _true_errors(prob.csr, sigma, np.asarray(res.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-7


def test_shift_relres_matches_nonswitching_estimates():
    """Regression: early-converged shifts' pi must be FROZEN at stop
    time, not read from the (unwritten) final archive row — the two
    mathematically identical solvers must report identical estimates
    when no switch occurs."""
    from mpi_bicgstab_tpu.models.generators import banded_random
    csr = banded_random(512, [1, -1, 9, -9], seed=2)
    sigma = np.linspace(0.0, 3.0, 16)
    prob = build_problem(csr, sigma_seed=0.0)
    cfg = ShiftedConfig(tol=1e-10, max_iter=600)
    r1 = solve_shifted(prob.A, prob.b, sigma, seed=0,
                       method="shifted_lopbicg", cfg=cfg)
    r2 = solve_shifted(prob.A, prob.b, sigma, seed=0,
                       method="shifted_lopbicg_switching", cfg=cfg)
    assert int(r2.final_seed) == 0        # no switch in this setup
    np.testing.assert_allclose(np.asarray(r2.shift_relres),
                               np.asarray(r1.shift_relres),
                               rtol=1e-6)


def test_shift_relres_sane_after_switch():
    """Regression (round-2 ADVICE): a shift that converges BEFORE a seed
    switch must keep a usable residual estimate afterwards — the frozen
    scale is the full zeta*pi product rebased at each switch, not a
    frozen pi combined with a post-switch zeta. Every converged shift's
    estimate must (a) certify convergence and (b) stay within a modest
    factor of the true residual."""
    csr, prob = _problem()
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    cfg = ShiftedConfig(tol=1e-11, max_iter=1000)
    res = solve_shifted(prob.A, prob.b, sigma, seed=4,
                        method="shifted_lopbicg_switching", cfg=cfg)
    assert int(res.final_seed) != 4          # a switch DID happen
    assert bool(np.asarray(res.stop_flags).all())
    est = np.asarray(res.shift_relres)
    b = np.asarray(prob.b, np.float64)
    true_rel = _true_errors(prob.csr, sigma, np.asarray(res.x_set), b)
    # converged estimates certify the tolerance (give 10x slack for the
    # estimate-vs-recursive gap)
    assert (est <= 1e-9).all(), est
    # and they are estimates OF the true residuals, not arbitrary
    # numbers: same order of magnitude band
    assert (true_rel <= np.maximum(est * 1e4, 1e-9)).all(), \
        (true_rel, est)


# ---------------------------------------------------------------------------
# blocked (deferred MXU) shift updates — solvers/switching_blocked.py
# ---------------------------------------------------------------------------

def test_blocked_matches_per_iteration():
    """Blocked updates re-associate the shift-update sums; solutions and
    iteration counts must match the per-iteration reference path."""
    csr, prob = _problem()
    cfg0 = ShiftedConfig(tol=1e-11, max_iter=800, shift_block=0)
    cfgB = ShiftedConfig(tol=1e-11, max_iter=800, shift_block=4)
    r0 = solve_shifted(prob.A, prob.b, SIGMA, seed=0,
                       method="shifted_lopbicg_switching", cfg=cfg0)
    rB = solve_shifted(prob.A, prob.b, SIGMA, seed=0,
                       method="shifted_lopbicg_switching", cfg=cfgB)
    assert bool(np.asarray(rB.stop_flags).all())
    assert abs(int(rB.n_iter) - int(r0.n_iter)) <= 2
    errs = _true_errors(prob.csr, SIGMA, np.asarray(rB.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-8, errs
    np.testing.assert_allclose(np.asarray(rB.x_set),
                               np.asarray(r0.x_set), atol=1e-9)


def test_blocked_switching_across_switch():
    """A seed switch fires mid-block: the block must flush before the
    history rebase, reproducing the per-iteration trajectory."""
    csr, prob = _problem()
    sigma = np.array([0.0, 0.05, 0.2, 1.0, 4.0])
    cfg0 = ShiftedConfig(tol=1e-11, max_iter=1000, shift_block=0)
    cfgB = ShiftedConfig(tol=1e-11, max_iter=1000, shift_block=7)
    r0 = solve_shifted(prob.A, prob.b, sigma, seed=4,
                       method="shifted_lopbicg_switching", cfg=cfg0)
    rB = solve_shifted(prob.A, prob.b, sigma, seed=4,
                       method="shifted_lopbicg_switching", cfg=cfgB)
    assert int(rB.final_seed) != 4, "expected a seed switch"
    assert int(rB.final_seed) == int(r0.final_seed)
    assert bool(np.asarray(rB.stop_flags).all())
    assert abs(int(rB.n_iter) - int(r0.n_iter)) <= 2
    errs = _true_errors(prob.csr, sigma, np.asarray(rB.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-8, errs


def test_blocked_block_bigger_than_run():
    # L larger than the total iteration count: single partial block
    csr, prob = _problem()
    cfgB = ShiftedConfig(tol=1e-11, max_iter=800, shift_block=512)
    rB = solve_shifted(prob.A, prob.b, SIGMA, seed=0,
                       method="shifted_lopbicg_switching", cfg=cfgB)
    assert bool(np.asarray(rB.stop_flags).all())
    errs = _true_errors(prob.csr, SIGMA, np.asarray(rB.x_set),
                        np.asarray(prob.b))
    assert errs.max() < 1e-8, errs


def test_blocked_auto_gating():
    import jax
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.solvers.switching_blocked import resolve_block
    b32 = jnp.zeros((64,), jnp.float32)
    cfg_auto = ShiftedConfig(shift_block=-1)
    cfg_off = ShiftedConfig(shift_block=0)
    if jax.default_backend() == "cpu":
        assert resolve_block(cfg_auto, b32, 512) == 0   # auto is TPU-only
    assert resolve_block(cfg_off, b32, 512) == 0
    assert resolve_block(ShiftedConfig(shift_block=16), b32, 512) == 16
    # df32 + explicit block is a config error (f32 matmuls would
    # discard double-float accuracy)
    from mpi_bicgstab_tpu.ops.precision import df_zeros
    with pytest.raises(ValueError):
        resolve_block(ShiftedConfig(shift_block=16), df_zeros((64,)), 512)
    assert resolve_block(cfg_auto, df_zeros((64,)), 512) == 0
