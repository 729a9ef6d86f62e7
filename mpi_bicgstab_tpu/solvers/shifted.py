"""Shifted-system (multi-sigma) BiCGStab solvers.

Solve (A + sigma_j I) x_j = b for a whole ladder of shifts from ONE
Krylov sequence: only the seed system does SpMVs and global dots; every
other shift is pure local vector work driven by scalar recurrences
(collinearity of shifted residuals). Communication per iteration is
independent of sigma_len — the reference's core trick.

Three algorithms (reference src/shifted_solver.c):

  shifted_bicgstab        — :13-180. Seed = the UNSHIFTED system (index 0
                            implicitly, s <- A p[0] with no sigma term,
                            line 90); xi/tau scalar recurrences.
  shifted_lopbicgstab     — :182-354. Seed = (A + sigma_seed I) (:261-262),
                            pi/eta/zeta recurrences (:283-289), shifted
                            omega (:298), omega_seed = (q,q)/(q,y) (:293).
                            The reference's _v2 (:357-529, reordered to
                            overlap dots) and _nooverlap (:531-701) are
                            the same math — XLA schedules the overlap —
                            and are exposed as aliases.
  shifted_pipe_lopbicgstab— :703-895. Pipelined seed iteration (s,z,w,v,t
                            vectors) fused with the shift recurrences;
                            SpMVs ride the in-flight dot reductions
                            (:813-815, :847-850). _nooverlap (:897-1086)
                            aliased likewise.

TPU mapping: the shift axis is a batched leading dimension — x_set/p_set
are [n_sigma, n_loc] arrays and all shift recurrences are vectorized [S]
scalar math plus masked rank-1 updates (outer products of [S]
coefficients with the shared q / r_old vectors), which XLA fuses into a
couple of VPU passes over the [S, n] state. The seed row is excluded by
mask and updated with its own BiCGStab formulas.

Stopping mirrors the reference: the shifted residual is ESTIMATED as
|scale_j| * ||r_seed|| (never recomputed — SURVEY quirk #5), where
scale_j = xi_curr*tau (shifted_bicgstab, :140) or 1/(zeta*pi)
(LOP variants, :316). Loop exits when max_j |scale_j|^2 (r,r) <=
tol^2 (r0,r0).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.precision import (vfma,  # noqa: F401
                                            is_df, vabs,
                                            vbroadcast_rows, vones, vvalue,
                                            vwhere, vzeros)
from mpi_bicgstab_tpu.solvers.base import exact_iters, ShiftedResult
from mpi_bicgstab_tpu.utils.config import ShiftedConfig


def _hist_init(cfg, dtype):
    return jnp.full((cfg.max_iter,), jnp.nan, dtype)


def _as_sigma(sigma, b):
    """The shift ladder in the working arithmetic (DF iff b is DF).
    A DF sigma (already split host-side, api.py) passes through; a
    plain array promotes with zero lo parts under trace."""
    if is_df(sigma):
        return sigma
    if is_df(b):
        from mpi_bicgstab_tpu.ops.precision import _as_df
        return _as_df(sigma)
    return jnp.asarray(sigma, b.dtype)


def _vtake0(v, i):
    """v[i] along axis 0, DF-aware (i may be traced)."""
    from mpi_bicgstab_tpu.ops.precision import DF
    return DF(v.hi[i], v.lo[i]) if is_df(v) else v[i]


def seed_true_relres(spmv, comm, b, sigma_seed, x_seed, dot_zero):
    """||b - (A + sigma_seed I) x_seed|| / ||r0||: one extra SpMV at
    exit on the CURRENT seed system. Every per-shift estimate is a
    scalar multiple of the seed residual, so this is the decoupling
    detector for the whole ladder (see solvers/base.ShiftedResult).
    sigma_seed is the seed system's shift: sigma[seed] for the LOP
    family, 0 for shifted_bicgstab's unshifted seed."""
    r_true = b - vfma(spmv(x_seed), sigma_seed, x_seed)
    td = comm.dot(r_true, r_true)
    return jnp.sqrt(vvalue(td) / vvalue(dot_zero))


def _shift_result(x_set, k, dot_r, dot_zero, scale_abs, tol2, hist, seed,
                  spmv, comm, b, sigma_seed, sc=None):
    from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
    sc = as_shift_comm(sc)
    relres = jnp.sqrt(vvalue(dot_r) / vvalue(dot_zero))
    history = jnp.sqrt(hist / vvalue(dot_zero))
    stop = scale_abs * scale_abs * vvalue(dot_r) \
        <= tol2 * vvalue(dot_zero)
    true_rr = seed_true_relres(spmv, comm, b, sigma_seed,
                               sc.take_row(x_set, seed, scale_abs.shape[0]),
                               dot_zero)
    return ShiftedResult(x_set=x_set, n_iter=k, final_relres=relres,
                         history=history, stop_flags=stop,
                         final_seed=jnp.int32(seed),
                         shift_relres=scale_abs * relres,
                         true_relres=true_rr)


def shifted_bicgstab(spmv, comm, b, sigma, cfg: ShiftedConfig,
                     shift_comm=None) -> ShiftedResult:
    """Multi-shift BiCGStab with the UNSHIFTED A as seed (reference
    shifted_solver.c:13-180; seed index 0 by construction, sigma[0] is
    expected to be 0 in the xi recurrence's derivation but any ladder is
    accepted exactly as the reference accepts one).

    The xi recurrence (:110): per shift j,
      xi_new = (xi_c * xi_o * a_old) /
               (a0*b_old*(xi_o - xi_c) + xi_o*a_old*(1 + a0*sigma_j))
    maps the seed polynomial to the shifted one; tau (:132) accumulates
    the omega-stabilizer ratios.

    shift_comm: optional parallel.sigma.SigmaComm — shards the [S, n]
    slabs over a second mesh axis (scalar recurrences replicate).
    """
    from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    n = b.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    mask = (jnp.arange(S) != 0)

    r_hat = b                                   # :72 (r = b, x0 = 0)
    rTr0 = comm.dot(b, b)                       # :70-71
    dot_zero = rTr0
    x_set0 = vzeros((sc.s_local(S), n), b)
    p_set0 = vbroadcast_rows(b, sc.s_local(S))  # :74 p[j]=b
    alpha0 = vones((S,), b)                     # :76
    beta0 = vzeros((S,), b)                     # :75
    omega0 = vzeros((S,), b)
    tau0 = vones((S,), b)                       # :79
    xi_old0 = vones((S,), b)                    # :77
    xi_curr0 = vones((S,), b)                   # :78
    max_xi0 = jnp.ones((), dtype)               # :86 (stopping, f32 ok)

    def cond(c):
        (k, x_set, p_set, r, alpha, beta, omega, tau, xi_old, xi_curr,
         rTr, dot_r, max_xi, hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (max_xi * max_xi * dot_r > tol2 * dot_zero) & (k < max_iter)

    def body(c):
        (k, x_set, p_set, r, alpha, beta, omega, tau, xi_old, xi_curr,
         rTr, dot_r, max_xi, hist) = c
        p_seed = sc.take_row(p_set, 0, S)
        s = spmv(p_seed)                        # :90 — seed is UNSHIFTED A
        rTs = comm.dot(r_hat, s)                # :91
        # shift p part 1 (:92-96) — mask folded into the coefficients
        # (seed row: (1,0)-affine identity), sliced to this sigma group
        beta_sh = (xi_curr / xi_old) ** 2 * beta[0]
        p_set = vfma(sc.coeff(mask, beta_sh, 1.0) * p_set,
                     sc.coeff(mask, tau * xi_curr), r[None, :])
        r_old = r                               # :97
        alpha_old = alpha[0]                    # :98
        beta_old = beta[0]                      # :99
        a0 = rTr / rTs                          # :102
        q = r - a0 * s                          # :104
        y = spmv(q)                             # :105 (unshifted)
        qTy, yTy = comm.dots((q, y), (y, y))    # :107-108
        # xi recurrence (:110-112)
        xi_new = (xi_curr * xi_old * alpha_old) / (
            a0 * beta_old * (xi_old - xi_curr)
            + xi_old * alpha_old * (1.0 + a0 * sigma))
        alpha_sh = (xi_new / xi_curr) * a0
        w0 = qTy / yTy                          # omega[0], :117
        x_set = sc.row_add(x_set, 0,
                           vfma(a0 * p_seed, w0, q), S)  # :118-119
        # shift x / p part 2 (:120-126)
        omega_sh = w0 / (1.0 + w0 * sigma)      # :121
        x_set = x_set + vfma(
            sc.coeff(mask, alpha_sh) * p_set,
            sc.coeff(mask, omega_sh * tau * xi_new), q[None, :])
        p_upd2 = sc.coeff(mask, omega_sh * tau * xi_new / alpha_sh) \
            * q[None, :] \
            - sc.coeff(mask, omega_sh * tau * xi_curr / alpha_sh) \
            * r_old[None, :]
        p_set = p_set + p_upd2
        r_new = q - w0 * y                      # :127
        dot_r, rTr_new = comm.dots((r_new, r_new), (r_hat, r_new))  # :128-130
        tau = vwhere(mask, tau / (1.0 + w0 * sigma), tau)           # :132
        b0 = (a0 / w0) * (rTr_new / rTr)        # :137
        # stopping factor uses xi_curr BEFORE the rotation (:139-142)
        abs_xi = vvalue(vabs(xi_curr * tau))
        max_xi = jnp.maximum(jnp.asarray(1.0, dtype),
                             jnp.max(jnp.where(mask, abs_xi, 0.0)))
        xi_old = vwhere(mask, xi_curr, xi_old)      # :143
        xi_curr = vwhere(mask, xi_new, xi_curr)     # :144
        p_set = sc.row_set(
            p_set, 0, vfma(r_new, b0, vfma(p_seed, -w0, s)), S)  # :145-147
        alpha = vwhere(mask, alpha_sh, alpha).at[0].set(a0)
        beta = vwhere(mask, beta_sh, beta).at[0].set(b0)
        omega = vwhere(mask, omega_sh, omega).at[0].set(w0)
        hist = hist.at[k].set(vvalue(dot_r))
        return (k + 1, x_set, p_set, r_new, alpha, beta, omega, tau,
                xi_old, xi_curr, rTr_new, dot_r, max_xi, hist)

    carry0 = (jnp.int32(0), x_set0, p_set0, b, alpha0, beta0, omega0,
              tau0, xi_old0, xi_curr0, rTr0, rTr0, max_xi0,
              _hist_init(cfg, dtype))
    out = lax.while_loop(cond, body, carry0)
    (k, x_set, _p, _r, _al, _be, _om, tau, _xo, xi_curr, _rTr, dot_r,
     _mx, hist) = out
    scale = jnp.where(mask, vvalue(vabs(xi_curr * tau)), 1.0)
    return _shift_result(x_set, k, dot_r, dot_zero, scale, tol2, hist, 0,
                         spmv, comm, b, vzeros((), b), sc=sc)


def shifted_lopbicgstab(spmv, comm, b, sigma, seed: int,
                        cfg: ShiftedConfig, shift_comm=None) -> ShiftedResult:
    """Shifted LOP-BiCGStab (reference shifted_solver.c:182-354).

    Seed system is (A + sigma[seed] I); shifts are RELATIVE:
    sigma[seed] - sigma[j] appears in every recurrence (:285,:298,:303).
    omega_seed = (q,q)/(q,y) (:293) — the 'locally optimal' choice that
    keeps the shifted omega recurrence rational.
    """
    from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    n = b.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    mask = (jnp.arange(S) != seed)
    sig_seed = sigma[seed]

    r_hat = b                                   # :242
    rTr0 = comm.dot(b, b)                       # :240-241
    dot_zero = rTr0
    x_set0 = vzeros((sc.s_local(S), n), b)
    p_set0 = sc.row_set(vzeros((sc.s_local(S), n), b), seed, b,
                        S)                      # :226,:252
    alpha0 = vones((S,), b)
    beta0 = vzeros((S,), b)
    omega0 = vzeros((S,), b)
    eta0 = vzeros((S,), b)                      # :247
    zeta0 = vones((S,), b)                      # :250
    pi_old0 = vones((S,), b)                    # :248
    pi_new0 = vones((S,), b)                    # :249
    max_zp0 = jnp.ones((), dtype)

    def cond(c):
        (k, x_set, p_set, r, alpha, beta, omega, eta, zeta, pi_old,
         pi_new, rTr, dot_r, max_zp, hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (max_zp * max_zp * dot_r > tol2 * dot_zero) & (k < max_iter)

    def body(c):
        (k, x_set, p_set, r, alpha, beta, omega, eta, zeta, pi_old,
         pi_new, rTr, dot_r, max_zp, hist) = c
        p_seed = sc.take_row(p_set, seed, S)
        s = spmv(p_seed) + sig_seed * p_seed             # :261-262
        rTs = comm.dot(r_hat, s)                         # :263
        # shift p part 1 (:264-269) — mask folded into coefficients
        # (seed row: (1,0)-affine identity), sliced per sigma group
        beta_sh = (pi_old / pi_new) ** 2 * beta[seed]
        p_set = vfma(sc.coeff(mask, beta_sh, 1.0) * p_set,
                     sc.coeff(mask, 1.0 / (pi_new * zeta)), r[None, :])
        pi_old = pi_new                                  # :270
        r_old = r                                        # :271
        alpha_old = alpha[seed]                          # :272
        beta_old = beta[seed]                            # :273
        a_s = rTr / rTs                                  # :276
        q = vfma(r, -a_s, s)                             # :277
        y = spmv(q) + sig_seed * q                       # :278-279
        qTq, qTy = comm.dots((q, q), (q, y))             # :281-282
        # pi/eta recurrence (:283-289)
        eta2 = (beta_old / alpha_old) * a_s * eta \
            - (sig_seed - sigma) * a_s * pi_old
        pi_new2 = eta2 + pi_old
        alpha_sh = (pi_old / pi_new2) * a_s
        eta = vwhere(mask, eta2, eta)
        pi_new = vwhere(mask, pi_new2, pi_new)
        w_s = qTq / qTy                                  # :293
        x_set = sc.row_add(x_set, seed,
                           vfma(a_s * p_seed, w_s, q), S)    # :294-295
        # shift x / p part 2 (:296-304); q is `r` in the C code there
        omega_sh = w_s / (1.0 - w_s * (sig_seed - sigma))        # :298
        x_set = x_set + vfma(
            sc.coeff(mask, alpha_sh) * p_set,
            sc.coeff(mask, omega_sh / (pi_new2 * zeta)), q[None, :])
        p_upd2 = sc.coeff(mask, omega_sh / (alpha_sh * zeta * pi_new2)) \
            * q[None, :] \
            - sc.coeff(mask, omega_sh / (alpha_sh * zeta * pi_old)) \
            * r_old[None, :]
        p_set = p_set + p_upd2
        zeta = vwhere(mask,
                      (1.0 - w_s * (sig_seed - sigma)) * zeta, zeta)  # :303
        r_new = vfma(q, -w_s, y)                         # :305
        dot_r, rTr_new = comm.dots((r_new, r_new), (r_hat, r_new))  # :306-308
        b_s = (a_s / w_s) * (rTr_new / rTr)              # :312
        abs_zp = vvalue(vabs(1.0 / (zeta * pi_new2)))    # :316
        max_zp = jnp.maximum(jnp.asarray(1.0, dtype),
                             jnp.max(jnp.where(mask, abs_zp, 0.0)))
        p_set = sc.row_set(
            p_set, seed,
            vfma(r_new, b_s, vfma(p_seed, -w_s, s)), S)      # :319-321
        alpha = vwhere(mask, alpha_sh, alpha).at[seed].set(a_s)
        beta = vwhere(mask, beta_sh, beta).at[seed].set(b_s)
        omega = vwhere(mask, omega_sh, omega).at[seed].set(w_s)
        hist = hist.at[k].set(vvalue(dot_r))
        return (k + 1, x_set, p_set, r_new, alpha, beta, omega, eta,
                zeta, pi_old, pi_new, rTr_new, dot_r, max_zp, hist)

    carry0 = (jnp.int32(0), x_set0, p_set0, b, alpha0, beta0, omega0,
              eta0, zeta0, pi_old0, pi_new0, rTr0, rTr0, max_zp0,
              _hist_init(cfg, dtype))
    out = lax.while_loop(cond, body, carry0)
    (k, x_set, _p, _r, _al, _be, _om, _eta, zeta, _po, pi_new, _rTr,
     dot_r, _mzp, hist) = out
    scale = jnp.where(mask, vvalue(vabs(1.0 / (zeta * pi_new))), 1.0)
    return _shift_result(x_set, k, dot_r, dot_zero, scale, tol2, hist,
                         seed, spmv, comm, b, sig_seed, sc=sc)


# The reference's reordered/no-overlap twins are the same recurrences;
# under XLA the schedule is the compiler's job, so they alias:
shifted_lopbicgstab_v2 = shifted_lopbicgstab            # ref :357-529
shifted_lopbicgstab_nooverlap = shifted_lopbicgstab     # ref :531-701


def shifted_pipe_lopbicgstab(spmv, comm, b, sigma, seed: int,
                             cfg: ShiftedConfig,
                             shift_comm=None) -> ShiftedResult:
    """Shifted PIPELINED LOP-BiCGStab (reference shifted_solver.c:703-895).

    The seed iteration is the pipelined BiCGStab recurrence (vectors
    s,z,w,v,t; alpha via the rational update :859) so each seed SpMV
    overlaps the in-flight dot reductions; the shift updates are the
    same pi/eta/zeta recurrences as the LOP variant, fused in.
    """
    from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    n = b.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    mask = (jnp.arange(S) != seed)
    sig_seed = sigma[seed]

    sspmv = lambda v: spmv(v) + sig_seed * v    # noqa: E731  (:765-770)

    r_hat = b                                   # :772
    rTr0 = comm.dot(b, b)                       # :763
    w0 = sspmv(b)                               # :765-766
    rTw0 = comm.dot(b, w0)                      # :767
    t0 = sspmv(w0)                              # :769-770
    dot_zero = rTr0
    alpha_seed0 = rTr0 / rTw0                   # :787
    alpha_old0 = vones((), b)                   # :786
    beta_seed0 = vzeros((), b)
    omega_seed0 = vzeros((), b)
    x_set0 = vzeros((sc.s_local(S), n), b)
    p_set0 = sc.row_set(vzeros((sc.s_local(S), n), b), seed, b, S)  # :782
    z0 = vzeros((n,), b)
    s0 = vzeros((n,), b)
    v0 = vzeros((n,), b)
    eta0 = vzeros((S,), b)
    zeta0 = vones((S,), b)
    pi_old0 = vones((S,), b)
    pi_new0 = vones((S,), b)
    max_zp0 = jnp.ones((), dtype)

    def cond(c):
        (k, x_set, p_set, r, w, t, s, z, v, a_s, a_old, b_s, w_s, eta,
         zeta, pi_old, pi_new, rTr, dot_r, max_zp, hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (max_zp * max_zp * dot_r > tol2 * dot_zero) & (k < max_iter)

    def body(c):
        (k, x_set, p_set, r, w, t, s, z, v, a_s, a_old, b_s, w_s, eta,
         zeta, pi_old, pi_new, rTr, dot_r, max_zp, hist) = c
        p_seed = r + b_s * (sc.take_row(p_set, seed, S)
                            - w_s * s)                   # :795-797
        p_set = sc.row_set(p_set, seed, p_seed, S)
        s = w + b_s * (s - w_s * z)                      # :798-800
        z = t + b_s * (z - w_s * v)                      # :801-803
        # shift p part 1 (:804-809) — mask folded into coefficients
        # (seed row: (1,0)-affine identity), sliced per sigma group
        beta_sh = (pi_old / pi_new) ** 2 * b_s
        p_set = vfma(sc.coeff(mask, beta_sh, 1.0) * p_set,
                     sc.coeff(mask, 1.0 / (pi_new * zeta)), r[None, :])
        r_old = r                                        # :810
        q = r - a_s * s                                  # :811
        y = w - a_s * z                                  # :812
        qTy, yTy = comm.dots((q, y), (y, y))             # :813-814
        v = sspmv(z)                 # rides the dots,     :815-816
        pi_old = pi_new                                  # :817
        beta_old = b_s                                   # :818
        # shift recurrence (:819-825) — alpha_old is the PREVIOUS
        # iteration's seed alpha (:858 updates it at iteration end)
        eta2 = (beta_old / a_old) * a_s * eta \
            - (sig_seed - sigma) * a_s * pi_old
        pi_new2 = eta2 + pi_old
        alpha_sh = (pi_old / pi_new2) * a_s
        eta = vwhere(mask, eta2, eta)
        pi_new = vwhere(mask, pi_new2, pi_new)
        w_s = qTy / yTy                                  # :829
        x_set = sc.row_add(x_set, seed,
                           a_s * p_seed + w_s * q, S)    # :830-831
        # shift x / p part 2 (:832-840)
        omega_sh = w_s / (1.0 - w_s * (sig_seed - sigma))        # :834
        x_set = x_set + vfma(
            sc.coeff(mask, alpha_sh) * p_set,
            sc.coeff(mask, omega_sh / (pi_new2 * zeta)), q[None, :])
        p_upd2 = sc.coeff(mask, omega_sh / (alpha_sh * zeta * pi_new2)) \
            * q[None, :] \
            - sc.coeff(mask, omega_sh / (alpha_sh * zeta * pi_old)) \
            * r_old[None, :]
        p_set = p_set + p_upd2
        zeta = vwhere(mask,
                      (1.0 - w_s * (sig_seed - sigma)) * zeta, zeta)  # :839
        r_new = q - w_s * y                              # :841
        w_new = y - w_s * (t - a_s * v)                  # :843-844
        dot_r, rTr_new, rhTw, rhTs, rhTz = comm.dots(
            (r_new, r_new), (r_hat, r_new), (r_hat, w_new),
            (r_hat, s), (r_hat, z))                      # :842,:846-849
        t = sspmv(w_new)             # rides the dots,     :850-851
        b_s = (a_s / w_s) * (rTr_new / rTr)              # :857
        a_old = a_s                                      # :858
        a_s = rTr_new / (rhTw + b_s * (rhTs - w_s * rhTz))  # :859
        abs_zp = vvalue(vabs(1.0 / (zeta * pi_new2)))    # :863
        max_zp = jnp.maximum(jnp.asarray(1.0, dtype),
                             jnp.max(jnp.where(mask, abs_zp, 0.0)))
        hist = hist.at[k].set(vvalue(dot_r))
        return (k + 1, x_set, p_set, r_new, w_new, t, s, z, v, a_s,
                a_old, b_s, w_s, eta, zeta, pi_old, pi_new, rTr_new,
                dot_r, max_zp, hist)

    carry0 = (jnp.int32(0), x_set0, p_set0, b, w0, t0, s0, z0, v0,
              alpha_seed0, alpha_old0, beta_seed0, omega_seed0, eta0,
              zeta0, pi_old0, pi_new0, rTr0, rTr0, max_zp0,
              _hist_init(cfg, dtype))
    out = lax.while_loop(cond, body, carry0)
    k, x_set = out[0], out[1]
    zeta, pi_new = out[14], out[16]
    dot_r, hist = out[18], out[20]
    scale = jnp.where(mask, vvalue(vabs(1.0 / (zeta * pi_new))), 1.0)
    return _shift_result(x_set, k, dot_r, dot_zero, scale, tol2, hist,
                         seed, spmv, comm, b, sig_seed, sc=sc)


shifted_pipe_lopbicgstab_nooverlap = shifted_pipe_lopbicgstab  # ref :897-1086


SHIFTED_SOLVERS = {
    "shifted_bicgstab": shifted_bicgstab,
    "shifted_lopbicgstab": shifted_lopbicgstab,
    "shifted_lopbicgstab_v2": shifted_lopbicgstab_v2,
    "shifted_lopbicgstab_nooverlap": shifted_lopbicgstab_nooverlap,
    "shifted_pipe_lopbicgstab": shifted_pipe_lopbicgstab,
    "shifted_pipe_lopbicgstab_nooverlap": shifted_pipe_lopbicgstab_nooverlap,
}
