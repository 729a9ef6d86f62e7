"""Shifted LOP-BiCG with per-shift stopping and seed switching — the
reference's flagship solver (what its root Makefile builds).

  shifted_lopbicg           — reference shifted_switching_solver.c:20-257.
      LOP-BiCG shifted solve where each converged shift freezes its
      vector updates (stop_flag, :75,:136-149) — on TPU a boolean mask
      over the shift axis instead of ragged control flow.

  shifted_lopbicg_switching — reference shifted_switching_solver.c:260-608.
      Additionally archives the per-iteration seed scalars alpha/beta/
      omega and the full pi history [sigma, iter] (:320-323). When the
      seed system converges while shifts remain, it picks the WORST
      remaining shift (max |1/(zeta pi)|, :470-473), REBASES the entire
      scalar history onto that shift as the new seed (alpha/beta/omega
      remap :494-498, residual rescale :499, pi/zeta recompute over all
      past iterations :509-517), sets seed = max_sigma (:525) and keeps
      iterating — so late-converging shifts get fresh dot-product
      information instead of drifting on stale recurrences.

TPU design notes:
  * the seed index is a TRACED int32 in the while_loop carry — dynamic
    row gathers (p_set[seed]) and scatters (.at[seed].add) handle it;
    no recompilation on switch.
  * the alpha/beta/omega history rebase is elementwise over the
    iteration axis -> one masked vector op, not a loop.
  * the pi/zeta history recompute is sequential in i -> lax.fori_loop
    with a traced upper bound k+1, executed only inside the lax.cond
    switch branch (rare event, O(max_iter * sigma_len) scalar work).
  * faithfulness: like the reference, rTr is NOT rescaled with r at a
    switch (:499 scales r only); the next seed alpha therefore matches
    the reference's trajectory exactly.

ACCURACY LIMIT AT LONG ITERATION COUNTS (measured, round 2 — see
docs/RESULTS_TPU.md): the per-shift solutions are built from
collinearity recurrences that are never re-anchored to the true
residuals, so their TRUE error drifts above the estimated residual over
thousands of iterations — ~4.7e-11 in f64 and ~1e-3 in df32 at ~1,800
iterations on transport_hard. For long ladders validate with
--check-error; prefer f64 (CPU) or expect ~1e-6-class true accuracy
from df32 in this regime. (The reference never measures this; its
true-error check is compile-time disabled, test_shifted.c:10.)
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.precision import (vabs, vbroadcast_rows, vcat,
                                            vfma, vones, vvalue, vwhere,
                                            vzeros)
from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
from mpi_bicgstab_tpu.solvers.base import ShiftedResult, exact_iters
from mpi_bicgstab_tpu.solvers.shifted import _as_sigma
from mpi_bicgstab_tpu.utils.config import ShiftedConfig


def shifted_lopbicg(spmv, comm, b, sigma, seed: int,
                    cfg: ShiftedConfig, shift_comm=None) -> ShiftedResult:
    """Per-shift-stopping LOP-BiCG (shifted_switching_solver.c:20-257).

    Converged shifts keep their x/p frozen via the active mask; the loop
    runs until every shift (including the seed system itself) meets
    |1/(zeta_j pi_j)|^2 (r,r) <= tol^2 (r0,r0)   (:199, seed scale 1 :192).

    shift_comm: optional parallel.sigma.SigmaComm — shards the [S, n]
    slabs over a second mesh axis; the [S] recurrences stay replicated.
    """
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    n = b.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    not_seed = (jnp.arange(S) != seed)
    sig_seed = sigma[seed]

    r_hat = b
    rTr0 = comm.dot(b, b)                       # :83-84
    dot_zero = rTr0
    x_set0 = vzeros((sc.s_local(S), n), b)
    p_set0 = vbroadcast_rows(b, sc.s_local(S))  # :87 p[j]=b
    alpha0 = vones((S,), b)
    beta0 = vzeros((S,), b)
    eta0 = vzeros((S,), b)
    zeta0 = vones((S,), b)
    pi_new0 = vones((S,), b)
    stop0 = jnp.zeros((S,), bool)               # :75
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        (k, x_set, p_set, r, alpha, beta, eta, zeta, pi_new, stop,
         rTr, dot_r, hist) = c
        return (jnp.sum(stop) < S) & (k < max_iter)        # :106

    def body(c):
        (k, x_set, p_set, r, alpha, beta, eta, zeta, pi_new, stop,
         rTr, dot_r, hist) = c
        active = not_seed & ~stop               # :137-138
        r_old = r                               # :108
        pi_old = pi_new                         # :109
        alpha_old = alpha[seed]                 # :110
        beta_old = beta[seed]                   # :111
        p_seed = sc.take_row(p_set, seed, S)
        s = spmv(p_seed) + sig_seed * p_seed    # :113-114
        rTs = comm.dot(r_hat, s)                # :116
        a_s = rTr / rTs                         # :119
        q = vfma(r, -a_s, s)                    # :120
        y = spmv(q) + sig_seed * q              # :121-122
        qTq, qTy = comm.dots((q, q), (q, y))    # :123-124
        w_s = qTq / qTy                         # :128
        x_set = sc.row_add(x_set, seed,
                           vfma(a_s * p_seed, w_s, q), S)  # :129-130
        # fused shift update (:136-149); the active mask is folded into
        # the coefficients (inactive rows: 0-increment / (1,0)-affine
        # identity — bit-preserving, same trick as the fused kernels)
        # and sc.coeff slices them to this sigma group's slab rows
        eta2 = (beta_old / alpha_old) * a_s * eta \
            - (sig_seed - sigma) * a_s * pi_old
        pi_new2 = eta2 + pi_old
        alpha_sh = (pi_old / pi_new2) * a_s
        omega_sh = w_s / (1.0 - w_s * (sig_seed - sigma))
        x_set = x_set + vfma(
            sc.coeff(active, alpha_sh) * p_set,
            sc.coeff(active, omega_sh / (pi_new2 * zeta)), q[None, :])
        p_set = p_set + vfma(
            sc.coeff(active, omega_sh / (alpha_sh * zeta * pi_new2))
            * q[None, :],
            sc.coeff(active, -(omega_sh / (alpha_sh * zeta * pi_old))),
            r_old[None, :])
        zeta2 = (1.0 - w_s * (sig_seed - sigma)) * zeta
        eta = vwhere(active, eta2, eta)
        pi_new = vwhere(active, pi_new2, pi_new)
        zeta = vwhere(active, zeta2, zeta)
        alpha = vwhere(active, alpha_sh, alpha).at[seed].set(a_s)
        r_new = vfma(q, -w_s, y)                # :156
        dot_r, rTr_new = comm.dots((r_new, r_new), (r_hat, r_new))  # :157-159
        b_s = (a_s / w_s) * (rTr_new / rTr)     # :163
        p_set = sc.row_set(
            p_set, seed,
            vfma(r_new, b_s, vfma(p_seed, -w_s, s)), S)     # :164-166
        # shift p part (:168-174) — uses the UPDATED zeta
        beta_sh = (pi_old / pi_new) ** 2 * b_s
        p_set = vfma(sc.coeff(active, beta_sh, 1.0) * p_set,
                     sc.coeff(active, 1.0 / (pi_new * zeta)),
                     r_new[None, :])
        beta = vwhere(active, beta_sh, beta).at[seed].set(b_s)
        # per-shift convergence (:184-203)
        abs_zp = jnp.where(not_seed, vvalue(vabs(1.0 / (zeta * pi_new))),
                           1.0)
        if not exact_iters(cfg):   # tol=0 bench contract: never stop a
            # shift — underflow to exactly 0.0 past the f32 floor would
            # otherwise flip every flag and exit at a data-dependent k
            # (base.exact_iters; same guard as the classic solvers).
            stop = stop | (~stop & (abs_zp * abs_zp * vvalue(dot_r)
                                    <= tol2 * vvalue(dot_zero)))
        hist = hist.at[k].set(vvalue(dot_r))
        return (k + 1, x_set, p_set, r_new, alpha, beta, eta, zeta,
                pi_new, stop, rTr_new, dot_r, hist)

    carry0 = (jnp.int32(0), x_set0, p_set0, b, alpha0, beta0, eta0,
              zeta0, pi_new0, stop0, rTr0, rTr0, hist0)
    out = lax.while_loop(cond, body, carry0)
    (k, x_set, _p, _r, _al, _be, _eta, _zeta, _pi, stop, _rTr, dot_r,
     hist) = out
    relres = jnp.sqrt(vvalue(dot_r) / vvalue(dot_zero))
    scale = jnp.where(not_seed, vvalue(vabs(1.0 / (_zeta * _pi))), 1.0)
    from mpi_bicgstab_tpu.solvers.shifted import seed_true_relres
    true_rr = seed_true_relres(spmv, comm, b, sig_seed,
                               sc.take_row(x_set, seed, S), dot_zero)
    return ShiftedResult(x_set=x_set, n_iter=k, final_relres=relres,
                         history=jnp.sqrt(hist / vvalue(dot_zero)),
                         stop_flags=stop, final_seed=jnp.int32(seed),
                         shift_relres=scale * relres,
                         true_relres=true_rr)


def init_switching_carry(b, sigma, seed: int, cfg: ShiftedConfig,
                         comm=None, shift_comm=None):
    """Initial while_loop carry of the seed-switching solver
    (shifted_switching_solver.c:297-364) — exposed so checkpoint/resume
    can rebuild the carry TEMPLATE (comm=None: rTr slots are zeros of
    the right type/shape) and swap in saved leaves
    (utils/checkpoint.save_carry / load_carry). With a sigma-sharded
    shift_comm the slab leaves are this group's [S/G, n] slice; all
    other leaves are replicated."""
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    n = b.shape[0]
    M = cfg.max_iter                   # archives sized M+1 (:297-299)
    x_set0 = vzeros((sc.s_local(S), n), b)
    p_set0 = vbroadcast_rows(b, sc.s_local(S))   # :348
    eta0 = vzeros((S,), b)                       # :351
    zeta0 = vones((S,), b)                       # :354
    pi_arc0 = vones((M + 1, S), b)               # :352-353 (rows 0,1 = 1)
    alpha_arc0 = vones((M + 1,), b)              # :363 alpha_arc[0]=1
    beta_arc0 = vzeros((M + 1,), b)              # :364 beta_arc[0]=0
    omega_arc0 = vones((M + 1,), b)              # [0] never read
    stop0 = jnp.zeros((S,), bool)
    hist0 = jnp.full((M,), jnp.nan, dtype)
    seed0 = jnp.int32(seed)
    # last LIVE zeta*pi per shift (the full residual scale, frozen at
    # stop time): carrying the product — not pi alone — keeps the
    # estimate correct for shifts that stopped before a seed switch
    # reset zeta to 1 for the recompute
    zp_eff0 = vones((S,), b)
    rTr0 = (_switch_dot_zero(comm, b) if comm is not None
            else vzeros((), b))                  # :344-345
    return (jnp.int32(1), seed0, x_set0, p_set0, b, eta0, zeta0,
            zp_eff0, pi_arc0, alpha_arc0, beta_arc0, omega_arc0, stop0,
            rTr0, rTr0, hist0)


# Named positions in the 16-leaf switching carry (the tuple built by
# init_switching_carry and threaded through _switching_loop). External
# consumers (utils/checkpoint's segment driver) must read through these
# accessors, never hard-code indices: a carry reorder would otherwise
# silently desynchronize their termination logic (round-2 ADVICE).
_CARRY_K = 0           # next iteration index (1-based, :297-299)
_CARRY_STOP = 12       # per-shift stop flags [S] bool


def carry_k(carry):
    """Next iteration index of a switching carry."""
    return carry[_CARRY_K]


def carry_stop_flags(carry):
    """Per-shift stop flags [S] of a switching carry."""
    return carry[_CARRY_STOP]


def _fused_shift_ok(x_set) -> bool:
    """Trace-time gate for the fused df32 shift-update kernel
    (ops/pallas_shift_update.py): DF state on the TPU backend with
    tileable shapes. f32 ladders use the blocked MXU path instead
    (solvers/switching_blocked.py), so this kernel is df32-only."""
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not is_df(x_set):
        return False
    from mpi_bicgstab_tpu.ops import pallas_shift_update as psu
    S, n = x_set.hi.shape
    return psu.available(S, n, x_set.hi.dtype)


def _switch_dot_zero(comm, b):
    """(r0, r0) = (b, b) — recomputed identically on every (re)entry
    since r_hat = b and x0 = 0 (:344-346)."""
    if comm is None:
        return None
    return comm.dot(b, b)


def _switching_loop(spmv, comm, b, sigma, cfg: ShiftedConfig, carry,
                    k_stop, shift_comm=None):
    """Run the seed-switching while_loop from `carry` until every shift
    stops, k reaches max_iter, or k reaches the traced bound `k_stop`
    (segmented execution for checkpoint/resume). Returns the final
    carry; arithmetic is bit-identical however the run is segmented —
    the carry IS the complete solver state."""
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    M = cfg.max_iter
    idxS = jnp.arange(S)
    idxM = jnp.arange(M + 1)

    r_hat = b                                    # :346
    dot_zero = _switch_dot_zero(comm, b)         # :344-345

    def cond(c):
        (k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc, a_arc,
         b_arc, w_arc, stop, rTr, dot_r, hist) = c
        return (jnp.sum(stop) < S) & (k < M + 1) & (k < k_stop)   # :374

    def body(c):
        (k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc, a_arc,
         b_arc, w_arc, stop, rTr, dot_r, hist) = c
        sig_seed = sigma[seed_i]
        not_seed = idxS != seed_i
        active = not_seed & ~stop
        r_old = r                                # :376
        p_seed = sc.take_row(p_set, seed_i, S)
        # --- seed iteration (one LOP-BiCGStab step on A + sig_seed I) ---
        s = spmv(p_seed) + sig_seed * p_seed     # :379-387
        rTs = comm.dot(r_hat, s)                 # :388
        a_k = rTr / rTs                          # :391
        a_arc = a_arc.at[k].set(a_k)
        q = vfma(r, -a_k, s)                     # :392 (q_loc_copy :393)
        y = spmv(q) + sig_seed * q               # :396-404
        qTq, qTy = comm.dots((q, q), (q, y))     # :405-406
        w_k = qTq / qTy                          # :410
        w_arc = w_arc.at[k].set(w_k)
        x_set = sc.row_add(x_set, seed_i,
                           vfma(a_k * p_seed, w_k, q), S)  # :411-412
        r_new = vfma(q, -w_k, y)                 # :413
        dot_r, rTr_new = comm.dots((r_new, r_new), (r_hat, r_new))  # :414-416
        b_k = (a_k / w_k) * (rTr_new / rTr)      # :420
        b_arc = b_arc.at[k].set(b_k)
        p_set = sc.row_set(
            p_set, seed_i,
            vfma(r_new, b_k, vfma(p_seed, -w_k, s)), S)    # :421-423
        # --- fused shift update (:429-445) ---
        pi_prev = pi_arc[k - 1]                  # pi_archive[j, k-1]
        a_km1 = a_arc[k - 1]
        b_km1 = b_arc[k - 1]
        eta2 = (b_km1 / a_km1) * a_k * eta \
            - (sig_seed - sigma) * a_k * pi_prev            # :432
        pi_k = eta2 + pi_prev                               # :434
        alpha_sh = (pi_prev / pi_k) * a_k                   # :435
        omega_sh = w_k / (1.0 - w_k * (sig_seed - sigma))   # :436
        zeta2 = (1.0 - w_k * (sig_seed - sigma)) * zeta     # :441
        beta_sh = (pi_prev / pi_k) ** 2 * b_k               # :442
        if _fused_shift_ok(x_set):
            # df32 on TPU: all three update stages of the [S, n] state
            # in ONE in-place Pallas pass, mask folded into the
            # coefficients (ops/pallas_shift_update.py); under sigma
            # sharding the kernel runs on this group's slab with the
            # local coefficient slices
            from mpi_bicgstab_tpu.ops.pallas_shift_update import \
                fused_shift_update_df
            zero_s = vzeros((S,), b)
            one_s = vones((S,), b)
            x_set, p_set = fused_shift_update_df(
                x_set, p_set, q, r_old, r_new,
                sc.loc(vwhere(active, alpha_sh, zero_s)),
                sc.loc(vwhere(active, omega_sh / (pi_k * zeta), zero_s)),
                sc.loc(vwhere(active, omega_sh / (alpha_sh * zeta * pi_k),
                              zero_s)),
                sc.loc(vwhere(active,
                              -(omega_sh / (alpha_sh * zeta * pi_prev)),
                              zero_s)),
                sc.loc(vwhere(active, beta_sh, one_s)),
                sc.loc(vwhere(active, 1.0 / (pi_k * zeta2), zero_s)))
        else:
            # mask folded into coefficients (inactive rows: 0-increment
            # / (1,0)-affine identity, bit-preserving) and sliced to
            # this sigma group's slab rows by sc.coeff
            x_set = x_set + vfma(
                sc.coeff(active, alpha_sh) * p_set,
                sc.coeff(active, omega_sh / (pi_k * zeta)),
                q[None, :])                                     # :437-438
            p_set = p_set + vfma(
                sc.coeff(active, omega_sh / (alpha_sh * zeta * pi_k))
                * q[None, :],
                sc.coeff(active,
                         -(omega_sh / (alpha_sh * zeta * pi_prev))),
                r_old[None, :])                                  # :439-440
            p_set = vfma(sc.coeff(active, beta_sh, 1.0) * p_set,
                         sc.coeff(active, 1.0 / (pi_k * zeta2)),
                         r_new[None, :])                         # :443-444
        eta = vwhere(active, eta2, eta)
        zeta = vwhere(active, zeta2, zeta)
        zp_eff = vwhere(active, zeta2 * pi_k, zp_eff)
        pi_arc = pi_arc.at[k].set(vwhere(active, pi_k, pi_arc[k]))
        # --- per-shift convergence + worst remaining shift (:450-475) ---
        abs_zp = jnp.where(not_seed,
                           vvalue(vabs(1.0 / (zeta * pi_arc[k]))), 1.0)
        newly = ~stop & (abs_zp * abs_zp * vvalue(dot_r)
                         <= tol2 * vvalue(dot_zero))
        if exact_iters(cfg):   # tol=0 bench contract: no per-shift stop,
            # no seed switch — run exactly to the iteration bound even if
            # dot_r underflows to 0.0 (base.exact_iters).
            newly = jnp.zeros_like(newly)
        stop = stop | newly
        remaining = ~stop
        ms = jnp.argmax(jnp.where(remaining & not_seed, abs_zp,
                                  -jnp.inf)).astype(jnp.int32)  # :470-473

        # --- seed switching (:490-527) ---
        def do_switch(args):
            (seed_i, r_new, eta, zeta, zp_eff, pi_arc, a_arc, b_arc,
             w_arc) = args
            from mpi_bicgstab_tpu.solvers.bicgstab import _debug_print_ok
            if getattr(cfg, "verbose_switch", False) and _debug_print_ok():
                # the reference prints switch diagnostics unconditionally
                # (shifted_switching_solver.c:519-526); here opt-in
                import jax
                jax.debug.print(
                    "seed switch at iter {k}: seed {old} -> {new}",
                    k=k, old=seed_i, new=ms)
            dsig = sigma[seed_i] - sigma[ms]
            ratio = vcat(
                [vones((1,), a_arc), pi_arc[:-1, ms] / pi_arc[1:, ms]])
            mask_i = (idxM >= 1) & (idxM <= k)
            a2 = vwhere(mask_i, a_arc * ratio, a_arc)           # :495
            b2 = vwhere(mask_i, b_arc * ratio * ratio, b_arc)   # :496
            w2 = vwhere(mask_i, w_arc / (1.0 - w_arc * dsig),
                        w_arc)                                  # :497
            zp_ms = zeta[ms] * pi_arc[k, ms]
            r2 = r_new / zp_ms                                  # :499
            eta2 = vzeros(eta.shape, eta)                       # :502
            zeta2 = vones(zeta.shape, zeta)                     # :504
            recompute = ~stop & (idxS != ms)                    # :511-512

            def hist_step(i, st):
                eta_i, zeta_i, pi_a = st
                e = (b2[i - 1] / a2[i - 1]) * a2[i] * eta_i \
                    - (sigma[ms] - sigma) * a2[i] * pi_a[i - 1]   # :513
                p_i = e + pi_a[i - 1]                             # :514
                z = (1.0 - w2[i] * (sigma[ms] - sigma)) * zeta_i  # :515
                eta_i = vwhere(recompute, e, eta_i)
                zeta_i = vwhere(recompute, z, zeta_i)
                pi_a = pi_a.at[i].set(vwhere(recompute, p_i, pi_a[i]))
                return (eta_i, zeta_i, pi_a)

            eta2, zeta2, pi_arc2 = lax.fori_loop(
                1, k + 1, hist_step, (eta2, zeta2, pi_arc))     # :509-517
            # rebase frozen scales into the new seed's basis: collinearity
            # r_j = r_old / zp_j and r2 = r_old / zp_ms give
            # zp_j_new = zp_j / zp_ms; live shifts get freshly recomputed
            # values (already in the new basis); the OLD seed had zp = 1
            zp_eff2 = vwhere(recompute, zeta2 * pi_arc2[k],
                             zp_eff / zp_ms)
            zp_eff2 = zp_eff2.at[seed_i].set(1.0 / zp_ms)
            return (ms, r2, eta2, zeta2, zp_eff2, pi_arc2, a2, b2, w2)

        def no_switch(args):
            return args

        switch_now = stop[seed_i] & (jnp.sum(stop) < S)         # :490
        (seed_i, r_new, eta, zeta, zp_eff, pi_arc, a_arc, b_arc,
         w_arc) = lax.cond(
            switch_now, do_switch, no_switch,
            (seed_i, r_new, eta, zeta, zp_eff, pi_arc, a_arc, b_arc,
             w_arc))

        hist = hist.at[k - 1].set(vvalue(dot_r))
        from mpi_bicgstab_tpu.solvers.bicgstab import _debug_print_ok
        if getattr(cfg, "out_iter", 0) and _debug_print_ok():
            import jax

            def _emit(_):
                jax.debug.print("iter {k}: seed relres {r:.6e}", k=k,
                                r=jnp.sqrt(vvalue(dot_r)
                                           / vvalue(dot_zero)))
                return 0
            lax.cond(k % cfg.out_iter == 0, _emit, lambda _: 0, 0)
        return (k + 1, seed_i, x_set, p_set, r_new, eta, zeta, zp_eff,
                pi_arc, a_arc, b_arc, w_arc, stop, rTr_new, dot_r, hist)

    return lax.while_loop(cond, body, carry)


def _switching_finish(out, spmv, comm, b, sigma,
                      shift_comm=None) -> ShiftedResult:
    """Carry -> ShiftedResult (the reference's exit prints, :555-598)."""
    sigma = _as_sigma(sigma, b)
    sc = as_shift_comm(shift_comm)
    S = sigma.shape[0]
    idxS = jnp.arange(S)
    dot_zero = _switch_dot_zero(comm, b)
    (k, seed_i, x_set, _p, _r, _eta, _zeta, _zp_eff, _pi, _aa, _ba, _wa,
     stop, _rTr, dot_r, hist) = out
    relres = jnp.sqrt(vvalue(dot_r) / vvalue(dot_zero))
    # per-shift estimated residuals (DISPLAY_SIGMA_RESIDUAL parity);
    # zp_eff holds each shift's LAST LIVE zeta*pi (frozen at stop;
    # live shifts carry their current value)
    scale = jnp.where(idxS != seed_i,
                      vvalue(vabs(1.0 / _zp_eff)), 1.0)
    from mpi_bicgstab_tpu.solvers.shifted import (_vtake0,
                                                  seed_true_relres)
    true_rr = seed_true_relres(spmv, comm, b, _vtake0(sigma, seed_i),
                               sc.take_row(x_set, seed_i, S), dot_zero)
    return ShiftedResult(x_set=x_set, n_iter=k - 1,        # :559 reports k-1
                         final_relres=relres,
                         history=jnp.sqrt(hist / vvalue(dot_zero)),
                         stop_flags=stop, final_seed=seed_i,
                         shift_relres=scale * relres,
                         true_relres=true_rr)


def shifted_lopbicg_switching(spmv, comm, b, sigma, seed: int,
                              cfg: ShiftedConfig,
                              shift_comm=None) -> ShiftedResult:
    """Seed-switching shifted solver (shifted_switching_solver.c:260-608).

    On TPU with a non-DF f32 ladder the shift updates run BLOCKED: L
    iterations of [S, n] updates deferred and applied as [S, L] @ [L, n]
    MXU matmuls (solvers/switching_blocked.py — cuts the hot loop's HBM
    traffic by L; cfg.shift_block controls it; composes with sigma
    sharding — each group flushes its local coefficient slices). The
    per-iteration path below remains the reference-exact build (f64,
    df32, CPU, and the segmented checkpoint driver always use it)."""
    from mpi_bicgstab_tpu.solvers.switching_blocked import (
        blocked_switching_loop, resolve_block)
    carry0 = init_switching_carry(b, sigma, seed, cfg, comm=comm,
                                  shift_comm=shift_comm)
    sigma_arr = _as_sigma(sigma, b)
    L = resolve_block(cfg, b, int(sigma_arr.hi.shape[0]
                                  if hasattr(sigma_arr, "hi")
                                  else sigma_arr.shape[0]))
    if L:
        out = blocked_switching_loop(spmv, comm, b, sigma, cfg, carry0,
                                     L, shift_comm=shift_comm)
    else:
        out = _switching_loop(spmv, comm, b, sigma, cfg, carry0,
                              k_stop=jnp.int32(cfg.max_iter + 1),
                              shift_comm=shift_comm)
    return _switching_finish(out, spmv, comm, b, sigma,
                             shift_comm=shift_comm)


def shifted_lopbicg_switching_segment(spmv, comm, b, sigma,
                                      cfg: ShiftedConfig, carry,
                                      k_stop):
    """One SEGMENT of the seed-switching solve: run from `carry` until
    k reaches the traced bound `k_stop` (or global termination). Returns
    (ShiftedResult, carry). Feeding the carry back into another segment
    reproduces the uninterrupted solve BIT-EXACTLY — the carry is the
    complete while_loop state, so segmentation never touches arithmetic
    (unlike the classic family's iterate-restart checkpoint, which
    rebuilds the Krylov space). Serialize the carry with
    utils.checkpoint.save_carry / load_carry.

    The reference has no checkpointing at all (SURVEY §5: any fault
    aborts the PJM job); this is the TPU-production answer for its
    longest-running solver family."""
    out = _switching_loop(spmv, comm, b, sigma, cfg, carry,
                          k_stop=jnp.asarray(k_stop, jnp.int32))
    return _switching_finish(out, spmv, comm, b, sigma), out


SWITCHING_SOLVERS = {
    "shifted_lopbicg": shifted_lopbicg,
    "shifted_lopbicg_switching": shifted_lopbicg_switching,
}
