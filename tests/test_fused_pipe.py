"""Fused pipelined-iteration kernels (ops/pallas_fused_pipe.py):
interpret-mode correctness vs the XLA formulas and solver equivalence
(the compiled path is chip-benched; VERDICT round-1 item #4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.models.generators import banded_random
from mpi_bicgstab_tpu.models.problem import build_problem
from mpi_bicgstab_tpu.ops.dia import dia_spmv
from mpi_bicgstab_tpu.ops.pallas_fused_pipe import (fused_phase_a,
                                                    fused_phase_b,
                                                    pipe_bicgstab_fused)
from mpi_bicgstab_tpu.utils.config import SolverConfig

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode suite is CPU-only; compiled runs are chip-"
           "benched (docs/RESULTS_TPU.md)")


def _setup():
    csr = banded_random(8192, [1, -1, 40, -40, 129, -129], seed=5)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    return csr, prob


def test_phase_a_matches_xla():
    csr, prob = _setup()
    A, n = prob.A, prob.n
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)  # noqa
    z2, r, p, s, w, z = (mk() for _ in range(6))
    al, be, om = 0.7, 0.3, 0.2
    sc = jnp.asarray([al, be, om], jnp.float32)
    v2, p2, s2, q, y, qTy, yTy = fused_phase_a(
        A.vals, z2, r, p, s, w, z, sc, A.offsets, interpret=True)
    # interpret mode's FP contraction differs from XLA:CPU's — on the
    # real chip the kernel is BIT-exact vs the XLA path (measured);
    # here compare to f32 rounding
    ac = lambda a, b: np.testing.assert_allclose(  # noqa: E731
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    ac(v2, dia_spmv(A, z2))
    ac(p2, r + be * (p - om * s))
    s2x = w + be * (s - om * z)
    ac(s2, s2x)
    ac(q, r - al * s2x)
    ac(y, w - al * z2)
    qx, yx = r - al * s2x, w - al * z2
    assert np.isclose(float(qTy), float(jnp.sum(qx * yx)), rtol=1e-3,
                      atol=0.05)
    assert np.isclose(float(yTy), float(jnp.sum(yx * yx)), rtol=1e-3)


def test_phase_b_matches_xla():
    csr, prob = _setup()
    A, n = prob.A, prob.n
    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)  # noqa
    w2, x, p2, q, y, rh, s2, z2 = (mk() for _ in range(8))
    al, om = 0.7, 0.2
    sc = jnp.asarray([al, om], jnp.float32)
    t2, x2, r2, dr, rTr, rhTw, rhTs, rhTz = fused_phase_b(
        A.vals, w2, x, p2, q, y, rh, s2, z2, sc, A.offsets,
        interpret=True)
    ac = lambda a, b: np.testing.assert_allclose(  # noqa: E731
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    ac(t2, dia_spmv(A, w2))
    ac(x2, x + al * p2 + om * q)
    ac(r2, q - om * y)
    r2x = q - om * y
    for got, want in ((dr, jnp.sum(r2x * r2x)), (rTr, jnp.sum(rh * r2x)),
                      (rhTw, jnp.sum(rh * w2)), (rhTs, jnp.sum(rh * s2)),
                      (rhTz, jnp.sum(rh * z2))):
        # f32 dots of ~n random terms: two summation orders differ by
        # ~eps * sum|terms|; near-cancelling dots need the abs floor
        assert np.isclose(float(got), float(want), rtol=1e-3,
                          atol=0.05), (float(got), float(want))


def test_fused_solver_matches_xla_pipe():
    from mpi_bicgstab_tpu.api import solve
    csr, prob = _setup()
    cfg = SolverConfig(tol=1e-5, max_iter=60, dtype=jnp.float32)
    res_f = pipe_bicgstab_fused(prob.A, prob.b,
                                jnp.zeros_like(prob.b), cfg,
                                interpret=True)
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-2  # f32 convergence at tol 1e-5


def test_fused_solver_pads_odd_sizes():
    csr = banded_random(4096, [1, -1, 17, -17], seed=3)
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    assert prob.n % 8192 != 0          # forces the internal padding
    cfg = SolverConfig(tol=1e-5, max_iter=60, dtype=jnp.float32)
    res = pipe_bicgstab_fused(prob.A, prob.b, jnp.zeros_like(prob.b),
                              cfg, interpret=True)
    assert bool(res.converged)
    assert res.x.shape[0] == prob.n


# ---------------------------------------------------------------------------
# df32 body-fused variant (ops/pallas_fused_pipe_df.py)
# ---------------------------------------------------------------------------

def test_df32_body_a_matches_xla():
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import fused_body_a
    from mpi_bicgstab_tpu.ops.precision import (DF, df_from_f64,
                                                df_to_f64, vfma)
    n = 8192
    rng = np.random.default_rng(0)
    mk = lambda: df_from_f64(rng.standard_normal(n))  # noqa: E731
    r, p, s, w, z, t, v = (mk() for _ in range(7))
    al, be, om = (df_from_f64(np.asarray(x))
                  for x in (0.7, 0.3, 0.2))
    sc = jnp.stack([al.hi, al.lo, be.hi, be.lo, om.hi, om.lo])
    p2, s2, z2, q, y, qTy, yTy = fused_body_a(r, p, s, w, z, t, v, sc,
                                              interpret=True)
    p2x = vfma(r, be, vfma(p, -om, s))
    s2x = vfma(w, be, vfma(s, -om, z))
    z2x = vfma(t, be, vfma(z, -om, v))
    qx = vfma(r, -al, s2x)
    yx = vfma(w, -al, z2x)
    for got, want in ((p2, p2x), (s2, s2x), (z2, z2x), (q, qx), (y, yx)):
        np.testing.assert_allclose(df_to_f64(got), df_to_f64(want),
                                   rtol=1e-13, atol=1e-13)
    from mpi_bicgstab_tpu.ops.precision import df_dot
    np.testing.assert_allclose(float(df_to_f64(qTy)),
                               float(df_to_f64(df_dot(qx, yx))),
                               rtol=1e-10)
    np.testing.assert_allclose(float(df_to_f64(yTy)),
                               float(df_to_f64(df_dot(yx, yx))),
                               rtol=1e-10)


def test_df32_canonical_config_engages_fused_path():
    """Regression for the round-2 dispatch bug: SolverConfig(dtype="df32")
    carried the raw string, so pallas_fused_pipe_df.available() was False
    and the bench of record silently measured the unfused XLA path.
    _canon_dtype now maps "df32" -> float32 at config construction; the
    structural gate must accept the canonical (A_df, cfg.dtype) pair."""
    from mpi_bicgstab_tpu.ops import pallas_fused_pipe, pallas_fused_pipe_df
    csr = banded_random(8192, [1, -1, 40, -40], seed=7)
    prob_df = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=0.0, max_iter=5, dtype="df32")
    assert cfg.dtype == jnp.float32
    assert pallas_fused_pipe_df.format_ok(prob_df.A, cfg.dtype)
    assert not pallas_fused_pipe.format_ok(prob_df.A, cfg.dtype)
    # and the f32 twin gate accepts the f32 operator under the same cfg
    prob_f = build_problem(csr, dtype=jnp.float32, multiple=8192)
    cfg_f = SolverConfig(tol=0.0, max_iter=5, dtype="float32")
    assert cfg_f.dtype == jnp.float32
    assert pallas_fused_pipe.format_ok(prob_f.A, cfg_f.dtype)
    assert not pallas_fused_pipe_df.format_ok(prob_f.A, cfg_f.dtype)


def test_df32_fused_solver_matches_xla_pipe():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import \
        pipe_bicgstab_fused_df
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    csr = banded_random(8192, [1, -1, 40, -40], seed=7)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=120, dtype=jnp.float32)
    res_f = pipe_bicgstab_fused_df(prob.A, prob.b,
                                   df_zeros_like(prob.b), cfg,
                                   interpret=True)
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-9, err


# ---------------------------------------------------------------------------
# df32 FULLY-fused variant (ops/pallas_fused_pipe_df2.py — SpMV in-kernel)
# ---------------------------------------------------------------------------

def test_df32_full_phase_a_matches_xla():
    from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import \
        fused_phase_a_full
    from mpi_bicgstab_tpu.ops.precision import (df_dot, df_from_f64,
                                                df_to_f64, vfma)
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=5)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(0)
    mk = lambda: df_from_f64(rng.standard_normal(n))  # noqa: E731
    w, r, p, s, z, v = (mk() for _ in range(6))
    al, be, om = (df_from_f64(np.asarray(x)) for x in (0.7, 0.3, 0.2))
    sc = jnp.stack([al.hi, al.lo, be.hi, be.lo, om.hi, om.lo])
    t, p2, s2, z2, q, y, qTy, yTy = fused_phase_a_full(
        A.vals, w, r, p, s, z, v, sc, A.offsets, interpret=True)
    tx = dia_spmv_df(A, w)
    z2x = vfma(tx, be, vfma(z, -om, v))
    p2x = vfma(r, be, vfma(p, -om, s))
    s2x = vfma(w, be, vfma(s, -om, z))
    qx = vfma(r, -al, s2x)
    yx = vfma(w, -al, z2x)
    for got, want in ((t, tx), (p2, p2x), (s2, s2x), (z2, z2x),
                      (q, qx), (y, yx)):
        np.testing.assert_allclose(df_to_f64(got), df_to_f64(want),
                                   rtol=1e-12, atol=1e-12)
    # dot tolerance is f32-class HERE ONLY: interpret-mode kernels
    # compile through XLA:CPU, whose codegen mangles the composed
    # compensation tree (even the f64-upcast form — measured this
    # round: eager 6e-14, jit 1.2e-7 on the same graph). Mosaic
    # preserves it; tests/test_chip_kernels.py is the precision gate.
    np.testing.assert_allclose(float(df_to_f64(qTy)),
                               float(df_to_f64(df_dot(qx, yx))),
                               rtol=5e-7)
    np.testing.assert_allclose(float(df_to_f64(yTy)),
                               float(df_to_f64(df_dot(yx, yx))),
                               rtol=5e-7)


def test_df32_full_phase_b_matches_xla():
    from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import \
        fused_phase_b_full
    from mpi_bicgstab_tpu.ops.precision import (df_dot, df_from_f64,
                                                df_to_f64, vfma)
    csr = banded_random(8192, [1, -1, 40, -40], seed=6)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(1)
    mk = lambda: df_from_f64(rng.standard_normal(n))  # noqa: E731
    z2, x, p2, q, y, t, rh, s2 = (mk() for _ in range(8))
    al, om = (df_from_f64(np.asarray(v_)) for v_ in (0.7, 0.25))
    sc = jnp.stack([al.hi, al.lo, om.hi, om.lo])
    v2, x2, r2, w2, dot_r, rTr, rhTw, rhTs, rhTz = fused_phase_b_full(
        A.vals, z2, x, p2, q, y, t, rh, s2, sc, A.offsets,
        interpret=True)
    v2x = dia_spmv_df(A, z2)
    w2x = vfma(y, -om, vfma(t, -al, v2x))
    x2x = vfma(vfma(x, al, p2), om, q)
    r2x = vfma(q, -om, y)
    for got, want in ((v2, v2x), (x2, x2x), (r2, r2x), (w2, w2x)):
        np.testing.assert_allclose(df_to_f64(got), df_to_f64(want),
                                   rtol=1e-12, atol=1e-12)
    # f32-class dot tolerance: interpret-only XLA:CPU mangling of the
    # compensation tree (see test_df32_full_phase_a_matches_xla)
    for got, want in ((dot_r, df_dot(r2x, r2x)), (rTr, df_dot(rh, r2x)),
                      (rhTw, df_dot(rh, w2x)), (rhTs, df_dot(rh, s2)),
                      (rhTz, df_dot(rh, z2))):
        np.testing.assert_allclose(float(df_to_f64(got)),
                                   float(df_to_f64(want)), rtol=1e-6,
                                   atol=1e-5)


def test_df32_full_fused_solver_matches_xla_pipe():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import \
        pipe_bicgstab_fused_df_full
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    csr = banded_random(8192, [1, -1, 40, -40], seed=7)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=120, dtype=jnp.float32)
    res_f = pipe_bicgstab_fused_df_full(prob.A, prob.b,
                                        df_zeros_like(prob.b), cfg,
                                        interpret=True)
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-9, err


# ---------------------------------------------------------------------------
# fused CLASSIC BiCGStab (ops/pallas_fused_classic.py)
# ---------------------------------------------------------------------------

def test_classic_k1_k2_k3_match_xla():
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import (fused_k1,
                                                           fused_k2,
                                                           fused_k3)
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=11)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)  # noqa
    r, p, s, rh, x = (mk() for _ in range(5))
    beta, omega = jnp.float32(0.3), jnp.float32(0.2)
    p2, s2, rhTs = fused_k1(A.vals, r, p, s, rh,
                            jnp.stack([beta, omega]), A.offsets,
                            interpret=True)
    p2x = r + beta * (p - omega * s)
    s2x = dia_spmv(A, p2x)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(rhTs), float(jnp.vdot(rh, s2x)),
                               rtol=1e-4)
    alpha = jnp.float32(0.7)
    q, y, qTy, yTy = fused_k2(A.vals, r, s2, jnp.stack([alpha]),
                              A.offsets, interpret=True)
    qx = r - alpha * s2
    yx = dia_spmv(A, qx)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qx),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yx),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(qTy), float(jnp.vdot(qx, yx)),
                               rtol=1e-4)
    np.testing.assert_allclose(float(yTy), float(jnp.vdot(yx, yx)),
                               rtol=1e-4)
    x2, r2, dot_r, rTr = fused_k3(x, p2, q, y, rh,
                                  jnp.stack([alpha, omega]),
                                  interpret=True)
    x2x = x + alpha * p2 + omega * q
    r2x = q - omega * y
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r2x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(float(dot_r), float(jnp.vdot(r2x, r2x)),
                               rtol=1e-4)
    np.testing.assert_allclose(float(rTr), float(jnp.vdot(rh, r2x)),
                               rtol=1e-4)


def test_classic_fused_solver_matches_xla():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import bicgstab_fused
    csr = banded_random(8192, [1, -1, 40, -40], seed=12)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    cfg = SolverConfig(tol=1e-5, max_iter=200, dtype=jnp.float32)
    res_f = bicgstab_fused(prob.A, prob.b, jnp.zeros_like(prob.b), cfg,
                           interpret=True)
    res_x = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_classic_fused_wide_band_margins():
    """Bands whose halo exceeds one 64-row tile (plr/phr > _TR) need
    multi-tile padded-carry margins — the round-5 regression: at the
    1.6M transport profile the far diagonals reach ~±15k elements
    (120 halo rows) and the hardcoded 1-tile margin broke `bicgstab`
    f32 in the bench of record (_margin_tiles now sizes it)."""
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import (_margin_tiles,
                                                           bicgstab_fused)
    csr = banded_random(16384, [1, -1, 9000, -9000], seed=7)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    assert _margin_tiles(prob.A.offsets) >= 2
    cfg = SolverConfig(tol=1e-5, max_iter=200, dtype=jnp.float32)
    res = bicgstab_fused(prob.A, prob.b, jnp.zeros_like(prob.b), cfg,
                         interpret=True)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_classic_fused_nonmultiple_n_pads():
    """n not a multiple of the 8192 grid: internal padding, same answer."""
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import bicgstab_fused
    csr = banded_random(5000, [1, -1, 30, -30], seed=13)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8)
    cfg = SolverConfig(tol=1e-5, max_iter=200, dtype=jnp.float32)
    res = bicgstab_fused(prob.A, prob.b, jnp.zeros_like(prob.b), cfg,
                         interpret=True)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


# ---------------------------------------------------------------------------
# df32 fused CLASSIC BiCGStab (ops/pallas_fused_classic_df.py)
# ---------------------------------------------------------------------------

def test_classic_df_kernels_match_xla():
    from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
    from mpi_bicgstab_tpu.ops.pallas_fused_classic_df import (fused_k1_df,
                                                              fused_k2_df,
                                                              fused_k3_df)
    from mpi_bicgstab_tpu.ops.precision import (df_dot, df_from_f64,
                                                df_to_f64, vfma)
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=15)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(4)
    mk = lambda: df_from_f64(rng.standard_normal(n))  # noqa: E731
    r, p, s, rh, x = (mk() for _ in range(5))
    be, om, al = (df_from_f64(np.asarray(v)) for v in (0.3, 0.2, 0.7))
    p2, s2, rhTs = fused_k1_df(A.vals, r, p, s, rh,
                               jnp.stack([be.hi, be.lo, om.hi, om.lo]),
                               A.offsets, interpret=True)
    p2x = vfma(r, be, vfma(p, -om, s))
    s2x = dia_spmv_df(A, p2x)
    np.testing.assert_allclose(df_to_f64(p2), df_to_f64(p2x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(df_to_f64(s2), df_to_f64(s2x),
                               rtol=1e-11, atol=1e-11)
    # dots: f32-class tolerance in interpret only (XLA:CPU mangles the
    # composed compensation tree; chip tests are the precision gate)
    np.testing.assert_allclose(float(df_to_f64(rhTs)),
                               float(df_to_f64(df_dot(rh, s2x))),
                               rtol=5e-6)
    q, y, qTy, yTy = fused_k2_df(A.vals, r, s2,
                                 jnp.stack([al.hi, al.lo]), A.offsets,
                                 interpret=True)
    qx = vfma(r, -al, s2)
    yx = dia_spmv_df(A, qx)
    np.testing.assert_allclose(df_to_f64(q), df_to_f64(qx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(df_to_f64(y), df_to_f64(yx),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(float(df_to_f64(qTy)),
                               float(df_to_f64(df_dot(qx, yx))),
                               rtol=5e-6)
    x2, r2, dot_r, rTr = fused_k3_df(
        x, p2, q, y, rh, jnp.stack([al.hi, al.lo, om.hi, om.lo]),
        interpret=True)
    x2x = vfma(vfma(x, al, p2), om, q)
    r2x = vfma(q, -om, y)
    np.testing.assert_allclose(df_to_f64(x2), df_to_f64(x2x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(df_to_f64(r2), df_to_f64(r2x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(df_to_f64(dot_r)),
                               float(df_to_f64(df_dot(r2x, r2x))),
                               rtol=5e-6)
    np.testing.assert_allclose(float(df_to_f64(rTr)),
                               float(df_to_f64(df_dot(rh, r2x))),
                               rtol=5e-6, atol=1e-6)


def test_classic_df_fused_solver_matches_xla():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_classic_df import \
        bicgstab_fused_df
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    csr = banded_random(8192, [1, -1, 40, -40], seed=16)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=150, dtype=jnp.float32)
    res_f = bicgstab_fused_df(prob.A, prob.b, df_zeros_like(prob.b),
                              cfg, interpret=True)
    res_x = solve(prob.A, prob.b, method="bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


# ---------------------------------------------------------------------------
# fused CA-BiCGStab (ops/pallas_fused_ca.py)
# ---------------------------------------------------------------------------

def test_ca_k1_k2_match_xla():
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.ops.pallas_fused_ca import fused_ca_k1, \
        fused_ca_k2
    csr = banded_random(16384, [1, -1, 40, -40, 129, -129], seed=21)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(5)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)  # noqa
    r, p, s, w, z, x, rh = (mk() for _ in range(7))
    al, be, om = jnp.float32(0.7), jnp.float32(0.3), jnp.float32(0.2)
    p2, s2, z2, q, y, qTy, yTy = fused_ca_k1(
        A.vals, r, p, s, w, z, jnp.stack([al, be, om]), A.offsets,
        interpret=True)
    p2x = r + be * (p - om * s)
    s2x = w + be * (s - om * z)
    z2x = dia_spmv(A, s2x)
    qx = r - al * s2x
    yx = w - al * z2x
    for got, want in ((p2, p2x), (s2, s2x), (z2, z2x), (q, qx),
                      (y, yx)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(qTy), float(jnp.vdot(qx, yx)),
                               rtol=1e-4)
    np.testing.assert_allclose(float(yTy), float(jnp.vdot(yx, yx)),
                               rtol=1e-4)
    x2, r2, w2, dot_r, rTr, rhTw, rhTs, rhTz = fused_ca_k2(
        A.vals, q, y, x, p2, rh, s2, z2, jnp.stack([al, om]),
        A.offsets, interpret=True)
    r2x = q - om * y
    w2x = dia_spmv(A, r2x)
    x2x = x + al * p2 + om * q
    for got, want in ((x2, x2x), (r2, r2x), (w2, w2x)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)
    for got, want in ((dot_r, jnp.vdot(r2x, r2x)),
                      (rTr, jnp.vdot(rh, r2x)),
                      (rhTw, jnp.vdot(rh, w2x)),
                      (rhTs, jnp.vdot(rh, s2)),
                      (rhTz, jnp.vdot(rh, z2))):
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4,
                                   atol=1e-3)


def test_ca_fused_solver_matches_xla():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_ca import ca_bicgstab_fused
    csr = banded_random(8192, [1, -1, 40, -40], seed=22)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    cfg = SolverConfig(tol=1e-5, max_iter=200, dtype=jnp.float32)
    res_f = ca_bicgstab_fused(prob.A, prob.b, jnp.zeros_like(prob.b),
                              cfg, interpret=True)
    res_x = solve(prob.A, prob.b, method="ca_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 1
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_rr_fused_solver_matches_xla_and_rr_fires():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe import \
        pipe_bicgstab_rr_fused
    csr = banded_random(8192, [1, -1, 40, -40], seed=23)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    # krr small so replacement iterations actually execute
    cfg = SolverConfig(tol=1e-5, max_iter=200, krr=5, nrr=3,
                       dtype=jnp.float32)
    res_f = pipe_bicgstab_rr_fused(prob.A, prob.b,
                                   jnp.zeros_like(prob.b), cfg,
                                   interpret=True)
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg)
    assert int(res_f.n_iter) > cfg.krr          # RR branch exercised
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(np.asarray(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-3, err


def test_rr_fused_df_solver_matches_xla_and_rr_fires():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import \
        pipe_bicgstab_rr_fused_df_full
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    csr = banded_random(8192, [1, -1, 40, -40], seed=24)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=150, krr=5, nrr=3,
                       dtype=jnp.float32)
    res_f = pipe_bicgstab_rr_fused_df_full(
        prob.A, prob.b, df_zeros_like(prob.b), cfg, interpret=True)
    res_x = solve(prob.A, prob.b, method="pipe_bicgstab_rr", cfg=cfg)
    assert int(res_f.n_iter) > cfg.krr          # RR branch exercised
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_ca_df_fused_solver_matches_xla():
    from mpi_bicgstab_tpu.api import solve
    from mpi_bicgstab_tpu.ops.pallas_fused_ca_df import \
        ca_bicgstab_fused_df
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, df_zeros_like
    csr = banded_random(8192, [1, -1, 40, -40], seed=26)
    prob = build_problem(csr, dtype="df32", multiple=8192)
    cfg = SolverConfig(tol=1e-11, max_iter=150, dtype=jnp.float32)
    res_f = ca_bicgstab_fused_df(prob.A, prob.b, df_zeros_like(prob.b),
                                 cfg, interpret=True)
    res_x = solve(prob.A, prob.b, method="ca_bicgstab", cfg=cfg)
    assert abs(int(res_f.n_iter) - int(res_x.n_iter)) <= 2
    assert bool(res_f.converged)
    err = np.abs(df_to_f64(res_f.x)[: csr.nrows] - 1.0).max()
    assert err < 1e-8, err


def test_classic_k1_wide_band_halo():
    """Offsets spanning many 128-lane rows (halo ~16 rows): the
    chunk-window DMA + in-window compute must still agree with XLA."""
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import fused_k1
    csr = banded_random(16384, [1, -1, 2000, -2000, 700, -700], seed=30)
    prob = build_problem(csr, dtype=jnp.float32, multiple=8192)
    A = prob.A
    n = prob.n
    rng = np.random.default_rng(9)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)  # noqa
    r, p, s, rh = (mk() for _ in range(4))
    be, om = jnp.float32(0.3), jnp.float32(0.2)
    p2, s2, rhTs = fused_k1(A.vals, r, p, s, rh, jnp.stack([be, om]),
                            A.offsets, interpret=True)
    p2x = r + be * (p - om * s)
    s2x = dia_spmv(A, p2x)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2x),
                               rtol=1e-5, atol=1e-4)
