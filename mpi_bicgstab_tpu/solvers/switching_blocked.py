"""Seed-switching shifted solver with BLOCKED (deferred, MXU) shift
updates — the TPU-native restructuring of the reference's hot loop.

The reference's flagship cost is the shift-update pass: 6 daxpy + 1
dscal of length n_loc per unconverged shift per iteration
(shifted_switching_solver.c:429-445), i.e. sigma_len x n_loc of pure
HBM daxpy traffic. The per-iteration XLA build of that pass (solvers/
switching.py) measures 25.9 ms/iter at sigma_len=512, n=1.6M f32 on a
v5e — already ~73% of the 4-stream HBM roofline, so no elementwise
kernel can improve it much. This module removes the traffic instead:

Each iteration's update of the [S, n] state is AFFINE in the iteration
vectors with per-shift scalar coefficients (:429-445):

    x_k = x_{k-1} + cxp.p_{k-1} + cxq.q_k
    p_k = m1.(p_{k-1} + cpq.q_k + cpr.r_{k-1}) + m2.r_k

Composing L such steps, the state after a block is

    p_L = aP (.) p_0 + pr0 (.) r_0 + CpQ @ Q + CpR @ R
    x_L = x_0 + xA (.) p_0 + xr0 (.) r_0 + CxQ @ Q + CxR @ R

with [S]-vector scalars (aP..xr0), [S, L] coefficient matrices
(C*Q/C*R, composed by O(S L) scalar recurrences per iteration), and
the Krylov basis Q = [q_1..q_L], R = [r_1..r_L] recorded as [L, n]
buffers. The [S, n] arrays are then touched ONCE per L iterations and
the rank-L application runs as [S, L] @ [L, n] matmuls on the MXU —
HBM traffic drops by L, and the flops move to the systolic array where
they are effectively free. Measured on the v5e (see docs/
RESULTS_TPU.md round 3): this is the difference between the shift
update dominating the solve and the shift update costing less than
the two seed SpMVs.

Semantics: identical update ORDER to solvers/switching._switching_loop
(same per-iteration scalar recurrences, archives, per-shift stopping,
worst-shift tracking, and history-rebase seed switching — a pending
switch flushes the block first, exactly reproducing the reference's
"switch happens after iteration k's shift updates", ssw:490-527). The
rank-L application re-associates the floating-point sums, so
trajectories match the per-iteration build to rounding (tests assert
equal iteration counts and solution error on convergence problems).

Scope: f32 / f64 (non-DF) dtypes. df32 keeps the per-iteration path:
an f32 MXU matmul's K-term accumulation rounds at 2^-24 per term,
which would throw away double-float accuracy; the df32 shift update is
instead fused elementwise (ops/pallas_shift_update.py).

Per-shift convergence masking (stop_flag, ssw:136-149) folds into the
coefficients: a stopped or seed row composes with cxp=cxq=cpq=cpr=0,
m1=1, m2=0 — an exact identity, so frozen shifts and the live seed row
pass through the flush bit-unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.solvers.base import exact_iters
from mpi_bicgstab_tpu.solvers.shifted import _as_sigma
from mpi_bicgstab_tpu.solvers.switching import _switch_dot_zero
from mpi_bicgstab_tpu.utils.config import ShiftedConfig

_HI = lax.Precision.HIGHEST


def resolve_block(cfg, b, sigma_len: int) -> int:
    """Blocked-update depth L to use (0 = per-iteration path).

    cfg.shift_block: -1 = auto (64 on the TPU backend for non-DF f32
    ladders of >= 8 shifts — measured knee of the time/iter-vs-L curve
    at sigma_len=512, n=1.6M on the v5e: L=16 4.86 ms, 32 3.64, 64
    2.39, 128 2.27 vs 25.87 per-iteration), 0 = off, >0 = explicit
    L."""
    from mpi_bicgstab_tpu.ops.precision import is_df
    sb = getattr(cfg, "shift_block", 0)
    if sb == 0:
        return 0
    if is_df(b):
        if sb > 0:
            raise ValueError(
                "shift_block is not supported for df32: the MXU matmul "
                "application rounds at f32 and would discard double-"
                "float accuracy (use the fused elementwise kernel)")
        return 0
    if sb > 0:
        return min(sb, cfg.max_iter)
    # auto
    if (jax.default_backend() == "tpu" and b.dtype == jnp.float32
            and sigma_len >= 8):
        return min(64, cfg.max_iter)
    return 0


def blocked_switching_loop(spmv, comm, b, sigma, cfg: ShiftedConfig,
                           carry, L: int, shift_comm=None):
    """Run the seed-switching solve from `carry` (the 16-leaf tuple of
    init_switching_carry) to termination with block depth L. Returns
    the final 16-leaf carry (same contract as _switching_loop with
    k_stop=max_iter+1, so _switching_finish applies unchanged).

    shift_comm: optional parallel.sigma.SigmaComm — the [S, n] slabs
    (and the [L, n] Q/R basis) are per-sigma-group shards; ALL blocked
    coefficient state (aP..CxR) is [S]/[S, L] scalar-rate work and
    replicates, so only the flush matmuls and the seed-row accesses
    need the local view."""
    from mpi_bicgstab_tpu.parallel.sigma import as_shift_comm
    sc = as_shift_comm(shift_comm)
    dtype = b.dtype
    sigma = _as_sigma(sigma, b)
    S = sigma.shape[0]
    n = b.shape[0]
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    M = cfg.max_iter
    idxS = jnp.arange(S)
    idxM = jnp.arange(M + 1)
    idxL = jnp.arange(L)

    r_hat = b                                    # :346
    dot_zero = _switch_dot_zero(comm, b)         # :344-345

    def outer_cond(c):
        (k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc, a_arc,
         b_arc, w_arc, stop, rTr, dot_r, hist) = c
        return (jnp.sum(stop) < S) & (k < M + 1)   # :374

    def inner_cond(c):
        (j, k, stop, pend) = c[0], c[1], c[13], c[27]
        return (j < L) & ~pend & (jnp.sum(stop) < S) & (k < M + 1)

    def inner_body(c):
        (j, k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc,
         a_arc, b_arc, w_arc, stop, rTr, dot_r, hist,
         Q, R, aP, pr0, CpQ, CpR, xA, xr0, CxQ, CxR, pend, ms_sw) = c
        sig_seed = sigma[seed_i]
        not_seed = idxS != seed_i
        active = not_seed & ~stop
        # --- seed iteration (identical to _switching_loop, :376-423) ---
        p_seed = sc.take_row(p_set, seed_i, S)
        s = spmv(p_seed) + sig_seed * p_seed     # :379-387
        rTs = comm.dot(r_hat, s)                 # :388
        a_k = rTr / rTs                          # :391
        a_arc = a_arc.at[k].set(a_k)
        q = r - a_k * s                          # :392
        y = spmv(q) + sig_seed * q               # :396-404
        qTq, qTy = comm.dots((q, q), (q, y))     # :405-406
        w_k = qTq / qTy                          # :410
        w_arc = w_arc.at[k].set(w_k)
        x_set = sc.row_add(x_set, seed_i,
                           a_k * p_seed + w_k * q, S)  # :411-412
        r_new = q - w_k * y                      # :413
        dot_r, rTr_new = comm.dots((r_new, r_new), (r_hat, r_new))
        b_k = (a_k / w_k) * (rTr_new / rTr)      # :420
        b_arc = b_arc.at[k].set(b_k)
        p_set = sc.row_set(
            p_set, seed_i,
            r_new + b_k * (p_seed - w_k * s), S)     # :421-423
        # --- shift-update COEFFICIENTS (:429-445, composed not applied) ---
        pi_prev = pi_arc[k - 1]
        a_km1 = a_arc[k - 1]
        b_km1 = b_arc[k - 1]
        eta2 = (b_km1 / a_km1) * a_k * eta \
            - (sig_seed - sigma) * a_k * pi_prev            # :432
        pi_k = eta2 + pi_prev                               # :434
        alpha_sh = (pi_prev / pi_k) * a_k                   # :435
        omega_sh = w_k / (1.0 - w_k * (sig_seed - sigma))   # :436
        zeta2 = (1.0 - w_k * (sig_seed - sigma)) * zeta     # :441
        beta_sh = (pi_prev / pi_k) ** 2 * b_k               # :442
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)
        cxp = jnp.where(active, alpha_sh, zero)             # :437-438
        cxq = jnp.where(active, omega_sh / (pi_k * zeta), zero)
        cpq = jnp.where(active,
                        omega_sh / (alpha_sh * zeta * pi_k), zero)
        cpr = jnp.where(active,
                        -omega_sh / (alpha_sh * zeta * pi_prev), zero)
        m1 = jnp.where(active, beta_sh, one)                # :443-444
        m2 = jnp.where(active, 1.0 / (pi_k * zeta2), zero)
        oh_j = (idxL == j).astype(dtype)[None, :]           # [1, L]
        oh_jm1 = (idxL == j - 1).astype(dtype)[None, :]
        # x_k = x + cxp.p_pre + cxq.q_j  (p_pre = state before stage 1/2)
        xA = xA + cxp * aP
        xr0 = xr0 + cxp * pr0
        CxQ = CxQ + cxp[:, None] * CpQ + cxq[:, None] * oh_j
        CxR = CxR + cxp[:, None] * CpR
        # p stage 1 (:439-440): p += cpq.q_j + cpr.r_{k-1}
        CpQ = CpQ + cpq[:, None] * oh_j
        pr0 = pr0 + jnp.where(j == 0, cpr, zero)
        CpR = CpR + jnp.where(j > 0, cpr, zero)[:, None] * oh_jm1
        # p stage 2 (:443-444): p = m1.p + m2.r_k
        aP = aP * m1
        pr0 = pr0 * m1
        CpQ = CpQ * m1[:, None]
        CpR = CpR * m1[:, None]
        CpR = CpR + m2[:, None] * oh_j
        # --- basis rows ---
        Q = Q.at[j].set(q)
        R = R.at[j].set(r_new)
        # --- scalar state / archives (identical to :269-278) ---
        eta = jnp.where(active, eta2, eta)
        zeta = jnp.where(active, zeta2, zeta)
        zp_eff = jnp.where(active, zeta2 * pi_k, zp_eff)
        pi_arc = pi_arc.at[k].set(jnp.where(active, pi_k, pi_arc[k]))
        # --- per-shift convergence + worst remaining (:450-475) ---
        abs_zp = jnp.where(not_seed,
                           jnp.abs(1.0 / (zeta * pi_arc[k])), 1.0)
        newly = ~stop & (abs_zp * abs_zp * dot_r <= tol2 * dot_zero)
        if exact_iters(cfg):   # tol=0 bench contract: no per-shift stop,
            # no seed switch — run exactly to the bound even on underflow
            # to 0.0 (base.exact_iters; mirrors switching.py).
            newly = jnp.zeros_like(newly)
        stop = stop | newly
        remaining = ~stop
        ms = jnp.argmax(jnp.where(remaining & not_seed, abs_zp,
                                  -jnp.inf)).astype(jnp.int32)
        pend = stop[seed_i] & (jnp.sum(stop) < S)           # :490
        hist = hist.at[k - 1].set(dot_r)
        from mpi_bicgstab_tpu.solvers.bicgstab import _debug_print_ok
        if getattr(cfg, "out_iter", 0) and _debug_print_ok():
            def _emit(_):
                jax.debug.print("iter {k}: seed relres {r:.6e}", k=k,
                                r=jnp.sqrt(dot_r / dot_zero))
                return 0
            lax.cond(k % cfg.out_iter == 0, _emit, lambda _: 0, 0)
        return (j + 1, k + 1, seed_i, x_set, p_set, r_new, eta, zeta,
                zp_eff, pi_arc, a_arc, b_arc, w_arc, stop, rTr_new,
                dot_r, hist, Q, R, aP, pr0, CpQ, CpR, xA, xr0, CxQ,
                CxR, pend, ms)

    def outer_body(c):
        (k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc, a_arc,
         b_arc, w_arc, stop, rTr, dot_r, hist) = c
        r0_blk = r
        Q = jnp.zeros((L, n), dtype)
        R = jnp.zeros((L, n), dtype)
        aP = jnp.ones((S,), dtype)
        pr0 = jnp.zeros((S,), dtype)
        xA = jnp.zeros((S,), dtype)
        xr0 = jnp.zeros((S,), dtype)
        CpQ = jnp.zeros((S, L), dtype)
        CpR = jnp.zeros((S, L), dtype)
        CxQ = jnp.zeros((S, L), dtype)
        CxR = jnp.zeros((S, L), dtype)
        inner0 = (jnp.int32(0), k, seed_i, x_set, p_set, r, eta, zeta,
                  zp_eff, pi_arc, a_arc, b_arc, w_arc, stop, rTr,
                  dot_r, hist, Q, R, aP, pr0, CpQ, CpR, xA, xr0, CxQ,
                  CxR, jnp.bool_(False), jnp.int32(0))
        (j, k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc,
         a_arc, b_arc, w_arc, stop, rTr, dot_r, hist, Q, R, aP, pr0,
         CpQ, CpR, xA, xr0, CxQ, CxR, pend, ms_sw) = lax.while_loop(
            inner_cond, inner_body, inner0)
        # --- FLUSH: rank-L application on the MXU (x before p: x reads
        # the block-entry p, whose non-seed rows are untouched until
        # the p overwrite below; the seed row's coefficient is 0).
        # Under sigma sharding each group applies its local coefficient
        # slices to its [S/G, n] slab — the matmuls shrink with G. ---
        x_set = (x_set + sc.loc(xA)[:, None] * p_set
                 + sc.loc(xr0)[:, None] * r0_blk[None, :]
                 + jnp.matmul(sc.loc(CxQ), Q, precision=_HI)
                 + jnp.matmul(sc.loc(CxR), R, precision=_HI))
        p_set = (sc.loc(aP)[:, None] * p_set
                 + sc.loc(pr0)[:, None] * r0_blk[None, :]
                 + jnp.matmul(sc.loc(CpQ), Q, precision=_HI)
                 + jnp.matmul(sc.loc(CpR), R, precision=_HI))

        # --- seed switching (:490-527), after the flush — identical to
        # _switching_loop.do_switch with k_sw = k - 1 (the iteration
        # that detected the switch) ---
        def do_switch(args):
            (seed_i, r, eta, zeta, zp_eff, pi_arc, a_arc, b_arc,
             w_arc) = args
            k_sw = k - 1
            ms = ms_sw
            from mpi_bicgstab_tpu.solvers.bicgstab import _debug_print_ok
            if getattr(cfg, "verbose_switch", False) and _debug_print_ok():
                jax.debug.print(
                    "seed switch at iter {k}: seed {old} -> {new}",
                    k=k_sw, old=seed_i, new=ms)
            dsig = sigma[seed_i] - sigma[ms]
            ratio = jnp.concatenate(
                [jnp.ones((1,), dtype), pi_arc[:-1, ms] / pi_arc[1:, ms]])
            mask_i = (idxM >= 1) & (idxM <= k_sw)
            a2 = jnp.where(mask_i, a_arc * ratio, a_arc)        # :495
            b2 = jnp.where(mask_i, b_arc * ratio * ratio, b_arc)  # :496
            w2 = jnp.where(mask_i, w_arc / (1.0 - w_arc * dsig),
                           w_arc)                               # :497
            zp_ms = zeta[ms] * pi_arc[k_sw, ms]
            r2 = r / zp_ms                                      # :499
            eta_n = jnp.zeros_like(eta)                         # :502
            zeta_n = jnp.ones_like(zeta)                        # :504
            recompute = ~stop & (idxS != ms)                    # :511-512

            def hist_step(i, st):
                eta_i, zeta_i, pi_a = st
                e = (b2[i - 1] / a2[i - 1]) * a2[i] * eta_i \
                    - (sigma[ms] - sigma) * a2[i] * pi_a[i - 1]  # :513
                p_i = e + pi_a[i - 1]                            # :514
                z = (1.0 - w2[i] * (sigma[ms] - sigma)) * zeta_i  # :515
                eta_i = jnp.where(recompute, e, eta_i)
                zeta_i = jnp.where(recompute, z, zeta_i)
                pi_a = pi_a.at[i].set(jnp.where(recompute, p_i, pi_a[i]))
                return (eta_i, zeta_i, pi_a)

            eta_n, zeta_n, pi_arc2 = lax.fori_loop(
                1, k_sw + 1, hist_step, (eta_n, zeta_n, pi_arc))
            zp_eff2 = jnp.where(recompute, zeta_n * pi_arc2[k_sw],
                                zp_eff / zp_ms)
            zp_eff2 = zp_eff2.at[seed_i].set(1.0 / zp_ms)
            return (ms, r2, eta_n, zeta_n, zp_eff2, pi_arc2, a2, b2, w2)

        def no_switch(args):
            return args

        (seed_i, r, eta, zeta, zp_eff, pi_arc, a_arc, b_arc,
         w_arc) = lax.cond(
            pend, do_switch, no_switch,
            (seed_i, r, eta, zeta, zp_eff, pi_arc, a_arc, b_arc, w_arc))
        return (k, seed_i, x_set, p_set, r, eta, zeta, zp_eff, pi_arc,
                a_arc, b_arc, w_arc, stop, rTr, dot_r, hist)

    return lax.while_loop(outer_cond, outer_body, carry)
