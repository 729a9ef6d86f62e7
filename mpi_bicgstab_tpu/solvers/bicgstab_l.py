"""BiCGStab(l) — polynomial-stabilized BiCGStab (Sleijpen & Fokkema,
ETNA 1, 1993), beyond the reference.

WHY (measured in this repo): BiCGStab's stabilizer is a DEGREE-1
minimal-residual polynomial per step — omega = (q,y)/(y,y). When A's
spectrum has eigenvalues with large imaginary parts (skew-dominant
operators, strong convection), the best degree-1 real polynomial
cannot damp a conjugate pair, omega collapses toward 0, and the
recurrences stagnate or silently decouple from the true residual —
exactly the failure class the true-residual gate (solvers/base.py)
was built to catch, observed on healthy banded fixtures in round 3
(est 1e-16 vs TRUE 6e-2). BiCGStab(l) replaces the degree-1 step with
a degree-l MR polynomial fitted over l BiCG steps: l = 2 already
handles conjugate pairs, l = 4 strongly skewed spectra.

Shape of one OUTER iteration (= l classic-iteration equivalents,
2l SpMVs):
  * BiCG part: l steps extending the stacked Krylov blocks
    R = [r, Ar-combinations...], U likewise — each step is 1 SpMV on
    U[j], 1 SpMV on R[j], and 2 scalar reductions (rho, gamma);
  * MR part: modified Gram-Schmidt over R[1..l] (l(l+1)/2 small dot
    reductions, batched pairwise where the recurrence allows), then
    the gamma back-substitutions — O(l^2) scalar work, no SpMVs.

TPU mapping: l is STATIC (2 or 4 exposed), so both parts unroll at
trace time; R/U are [l+1, n] stacked slabs (DF pairs stack leafwise)
and every row update is a fused VPU axpy. Convergence is checked per
OUTER iteration; n_iter counts classic-equivalents (k += l) so
max_iter and history remain comparable across the family. Works
unchanged on the distributed path (spmv + comm are injected) and under
vmap (solve_batched).

The reference has no BiCGStab(l); cited against its family structure
only (solver.c:35-146 for the shared conventions).
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.precision import vfma, vones, vvalue, vzeros
from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult
from mpi_bicgstab_tpu.solvers.bicgstab import (_finish,
                                               _maybe_print_residual,
                                               _scalar_zero)
from mpi_bicgstab_tpu.utils.config import SolverConfig


def _row(slab, i):
    return slab[i]


def bicgstab_l(spmv, comm, b, x0, cfg: SolverConfig,
               l: int = 2) -> SolveResult:
    """BiCGStab(l) with static l (Sleijpen-Fokkema algorithm 3.1)."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter

    r0 = b - spmv(x0)
    r_hat = r0
    rTr0 = comm.dot(r0, r0)
    dot_zero = rTr0
    one = vones((), rTr0)
    R0 = vzeros((l + 1, b.shape[0]), b).at[0].set(r0)
    U0 = vzeros((l + 1, b.shape[0]), b)
    rho0_0 = one                          # rho_0 = 1
    alpha0 = _scalar_zero(rTr0, dtype)    # alpha = 0
    omega0 = one                          # omega = 1
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        k, x, R, U, rho0, alpha, omega, dot_r, hist = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)

    def body(c):
        k, x, R, U, rho0, alpha, omega, dot_r, hist = c
        rho0 = -omega * rho0
        # ---- BiCG part: l steps growing the Krylov blocks ----
        for j in range(l):
            rho1 = comm.dot(_row(R, j), r_hat)
            beta = alpha * (rho1 / rho0)
            rho0 = rho1
            for i in range(j + 1):
                U = U.at[i].set(vfma(_row(R, i), -beta, _row(U, i)))
            U = U.at[j + 1].set(spmv(_row(U, j)))
            gamma_j = comm.dot(_row(U, j + 1), r_hat)
            alpha = rho0 / gamma_j
            for i in range(j + 1):
                R = R.at[i].set(vfma(_row(R, i), -alpha, _row(U, i + 1)))
            R = R.at[j + 1].set(spmv(_row(R, j)))
            x = vfma(x, alpha, _row(U, 0))
        # ---- MR part: modified Gram-Schmidt over R[1..l] ----
        tau = {}                 # tau[i][j], 1 <= i < j <= l
        sigma = [None] * (l + 1)
        gam_p = [None] * (l + 1)
        for j in range(1, l + 1):
            for i in range(1, j):
                t = comm.dot(_row(R, j), _row(R, i)) / sigma[i]
                tau[(i, j)] = t
                R = R.at[j].set(vfma(_row(R, j), -t, _row(R, i)))
            # sigma_j = (R_j, R_j), gamma'_j = (R_0, R_j)/sigma_j — one
            # batched reduction (the CA trick, comm.dots)
            sj, g0j = comm.dots((_row(R, j), _row(R, j)),
                                (_row(R, 0), _row(R, j)))
            sigma[j] = sj
            gam_p[j] = g0j / sj
        gam = [None] * (l + 1)
        gam[l] = gam_p[l]
        omega = gam[l]
        for j in range(l - 1, 0, -1):
            acc = gam_p[j]
            for i in range(j + 1, l + 1):
                acc = acc - tau[(j, i)] * gam[i]
            gam[j] = acc
        gam_pp = [None] * l
        for j in range(1, l):
            acc = gam[j + 1]
            for i in range(j + 1, l):
                acc = acc + tau[(j, i)] * gam[i + 1]
            gam_pp[j] = acc
        # ---- update x, r, u from the MR combination ----
        x = vfma(x, gam[1], _row(R, 0))
        r_new = vfma(_row(R, 0), -gam_p[l], _row(R, l))
        u_new = vfma(_row(U, 0), -gam[l], _row(U, l))
        for j in range(1, l):
            u_new = vfma(u_new, -gam[j], _row(U, j))
            x = vfma(x, gam_pp[j], _row(R, j))
            r_new = vfma(r_new, -gam_p[j], _row(R, j))
        R = R.at[0].set(r_new)
        U = U.at[0].set(u_new)
        dot_r = comm.dot(r_new, r_new)
        hist = hist.at[k + l - 1].set(vvalue(dot_r), mode="drop")
        _maybe_print_residual(cfg, k + l - 1, dot_r, dot_zero)
        return (k + l, x, R, U, rho0, alpha, omega, dot_r, hist)

    k0 = jnp.int32(0)
    out = lax.while_loop(cond, body, (k0, x0, R0, U0, rho0_0, alpha0,
                                      omega0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[7], out[8]
    return _finish(x, k, dot_r, dot_zero, tol2, hist, spmv, comm, b)


bicgstab_l2 = partial(bicgstab_l, l=2)
bicgstab_l4 = partial(bicgstab_l, l=4)
