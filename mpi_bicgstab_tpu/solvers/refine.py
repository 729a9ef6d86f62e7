"""Per-shift refinement: batched BiCGStab over the shift axis.

WHY (measured, round 2 — docs/RESULTS_TPU.md): the shifted family
builds every x_j from collinearity recurrences that are never
re-anchored to the true residuals, so TRUE per-shift errors drift
above the estimated residuals over long runs (~4.7e-11 in f64 and
~1e-3 in df32 at ~1,800 iterations on transport_hard). The classic
family fixes the analogous drift with residual replacement
(solver.c:433-576); the shifted recurrences have no equivalent — their
whole point is never touching the shifted systems directly.

This module is the equivalent the reference lacks: after the shifted
solve, every shift is polished INDEPENDENTLY but SIMULTANEOUSLY — one
batched BiCGStab over the [S, n] state, each row solving
(A + sigma_j I) x_j = b warm-started at the recurrence solution. Per
iteration: one batched SpMV (vmapped base operator + sigma scaling) and
rowwise dots; converged rows freeze under a mask (like the per-shift
stopping of shifted_switching_solver.c:136-149). Cost is S independent
Krylov solves' worth of FLOPs, but each starts at ~the drift level
(1e-3..1e-6) instead of 1, so tens of iterations typically suffice.

Works for f32/f64 arrays and df32 DF pairs, single-device or inside
shard_map (rowwise local dots + comm.allreduce over the row axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.precision import (DF, df_dot, df_zeros, is_df,
                                            vfma, vwhere, vvalue)
from mpi_bicgstab_tpu.utils.config import SolverConfig


def _row_dot(comm, u, v):
    """Per-row dot of [S, n] operands -> [S] (compensated for DF /
    f32), reduced over the sharded row axis."""
    if is_df(u) or is_df(v):
        return comm.allreduce(df_dot(u, v, axis=-1))
    return comm.allreduce(jnp.sum(u * v, axis=-1))


def _shifted_op(spmv, sigma):
    """[S, n] -> [S, n]: row j gets (A + sigma_j I) x_j via the vmapped
    base operator."""
    smul = lambda x: _col(sigma) * x                 # noqa: E731

    def op(x_set):
        if is_df(x_set):
            ys = jax.vmap(lambda h, l: spmv(DF(h, l)))(x_set.hi, x_set.lo)
            return ys + smul(x_set)
        return jax.vmap(spmv)(x_set) + smul(x_set)

    return op


def refine_shifted(spmv, comm, b, sigma, x_set, cfg: SolverConfig):
    """Polish x_set so each row's TRUE residual meets cfg.tol * ||b||.

    Returns (x_set, n_iter, true_relres [S]). Rows already below
    tolerance are returned untouched (masked from iteration 0)."""
    op = _shifted_op(spmv, sigma)
    S = x_set.shape[0]
    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter

    bTb = _row_dot(comm, _bcast(b, 1), _bcast(b, 1))[0]
    r0 = _bcast(b, S) - op(x_set)
    r_hat = r0
    rTr0 = _row_dot(comm, r0, r0)
    live0 = vvalue(rTr0) > vvalue(bTb) * vvalue(tol2)

    def cond(c):
        k, x, r, p, rTr, dot_r, live = c
        return jnp.any(live) & (k < max_iter)

    def body(c):
        k, x, r, p, rTr, dot_r, live = c
        s = op(p)
        rTs = _row_dot(comm, r_hat, s)
        alpha = rTr / rTs
        q = vfma(r, -_col(alpha), s)
        y = op(q)
        qTy = _row_dot(comm, q, y)
        yTy = _row_dot(comm, y, y)
        omega = qTy / yTy
        x_new = vfma(vfma(x, _col(alpha), p), _col(omega), q)
        r_new = vfma(q, -_col(omega), y)
        dot_new = _row_dot(comm, r_new, r_new)
        rTr_new = _row_dot(comm, r_hat, r_new)
        beta = (alpha / omega) * (rTr_new / rTr)
        p_new = vfma(r_new, _col(beta), vfma(p, -_col(omega), s))
        m = live[:, None]
        x = vwhere(m, x_new, x)
        r = vwhere(m, r_new, r)
        p = vwhere(m, p_new, p)
        rTr = vwhere(live, rTr_new, rTr)
        dot_r = vwhere(live, dot_new, dot_r)
        live = live & (vvalue(dot_r) > vvalue(bTb) * vvalue(tol2))
        return k + 1, x, r, p, rTr, dot_r, live

    carry0 = (jnp.int32(0), x_set, r0, r0, rTr0, rTr0, live0)
    k, x, _r, _p, _rTr, dot_r, _live = lax.while_loop(cond, body, carry0)
    relres = jnp.sqrt(vvalue(dot_r) / vvalue(bTb))
    return x, k, relres


def _bcast(b, S: int):
    """[n] -> [S, n] broadcast (materialized for DF)."""
    if is_df(b):
        return DF(jnp.broadcast_to(b.hi, (S,) + b.hi.shape),
                  jnp.broadcast_to(b.lo, (S,) + b.lo.shape))
    return jnp.broadcast_to(b, (S,) + b.shape)


def _col(a):
    """[S] -> [S, 1] for row-wise scalar broadcasting (DF-aware)."""
    if is_df(a):
        return DF(a.hi[:, None], a.lo[:, None])
    return a[:, None]
