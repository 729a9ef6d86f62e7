"""df32 pipelined-BiCGStab with FULLY-fused iteration phases: the DF
DIA SpMV runs INSIDE the phase kernels (round-2 VERDICT next #4 — the
band multiply previously stayed on XLA between the two body kernels,
costing two extra full passes over the iterate and the XLA dispatch
boundaries around them).

Per iteration exactly TWO Pallas kernels run, mirroring the
reference's two SpMV-anchored phases (solver.c:352-385):

  phase A (resident w):   t  = A w                       (DF DIA core)
                          z' = t + beta (z - omega v)
                          p' = r + beta (p - omega s)
                          s' = w + beta (s - omega z)
                          q  = r - alpha s'
                          y  = w - alpha z'
                          DF partials (q,y), (y,y)
  phase B (resident z'):  v' = A z'                      (DF DIA core)
                          w' = y - omega'(t - alpha v')
                          x' = x + alpha p' + omega' q
                          r' = q - omega' y
                          DF partials (r',r'), (rh,r'), (rh,w'),
                                      (rh,s'), (rh,z')

The SpMV input cannot be fully VMEM-resident in DF at Transport scale
(hi+lo of 1.6M rows = 12.8 MB + value streams busts the ~13 MB
budget), so the kernels stream it in CHUNKS: the grid's G row tiles
are grouped into chunks of CH tiles, and at each chunk head the
(chunk + band halo) window of the padded iterate is DMA'd into a VMEM
scratch — re-read overhead = halo/chunk (a few %), window ~2 MB. All
in-kernel arithmetic uses the error-free-transform DF ops
(ops/precision.py), exact under Mosaic (probed round 2).

Reference: pipe_bicgstab solver.c:292-417 with identical update order;
the overlap the reference hand-schedules (SpMV between Iallreduce post
and wait, solver.c:363-385) is subsumed — the dots' grid-axis
reduction happens after both phases with no communication to hide on
one chip, and on a mesh the distributed driver handles collectives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import (_df, _df_scalar,
                                                       _dot_row_df,
                                                       _sum_dot_rows,
                                                       _tile_df_dot)

_LANES = 128
_SUB = 8
_TR = 64            # tile rows (sublanes) per grid step
_SLACK = 8          # window over-allocation for the roll's +1 row


def _chunk_tiles(G: int) -> int:
    """Largest divisor of G that is <= 32 (window ~2 MB at tr=64)."""
    for c in range(min(G, 32), 0, -1):
        if G % c == 0:
            return c
    return 1


def format_ok(A, dtype) -> bool:
    """Square DF-valued DiaMatrix whose chunk window + value streams
    fit VMEM (canonical df32 config dtype is float32)."""
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not isinstance(A, DiaMatrix) or not is_df(A.vals):
        return False
    if dtype != jnp.float32 or A.n_rows != A.n_cols or A.n_diags < 1:
        return False
    n = -(-A.n_rows // (_TR * _LANES)) * (_TR * _LANES)
    G = n // _LANES // _TR
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(A.offsets)
    wr = CH * _TR + plr + phr + _SLACK
    win_b = 2 * wr * _LANES * 4
    vals_b = 2 * 2 * A.n_diags * _TR * _LANES * 4      # dbuf x (hi,lo)
    stream_b = 2 * 26 * _TR * _LANES * 4               # worst phase
    return win_b + vals_b + stream_b <= 13 * 1024 * 1024


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_DF2", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype)


def _pad_rows(vec_df, plr: int, phr: int, lo=None, hi=None):
    """[n] DF -> (plr + nr + phr + slack, 128) f32 pair. The halo rows
    are zeros by default (out-of-band reads inert, single device); in
    the DISTRIBUTED halo-fused path lo/hi are DF pairs carrying the
    neighbor shards' band-edge values (lo = previous shard's last
    plr*128 elements, hi = next shard's first phr*128) — the df32
    analogue of pallas_fused_pipe._pad_rows' distributed mode."""
    n = vec_df.hi.shape[0]
    nr = n // _LANES
    tot = plr + nr + phr + _SLACK

    def one(a, lo_a, hi_a):
        out = jnp.zeros((tot, _LANES), jnp.float32)
        out = out.at[plr:plr + nr, :].set(a.reshape(nr, _LANES))
        if lo_a is not None and plr:
            out = out.at[:plr, :].set(lo_a.reshape(plr, _LANES))
        if hi_a is not None and phr:
            out = out.at[plr + nr:plr + nr + phr, :].set(
                hi_a.reshape(phr, _LANES))
        return out

    return (one(vec_df.hi, None if lo is None else lo.hi,
                None if hi is None else hi.hi),
            one(vec_df.lo, None if lo is None else lo.lo,
                None if hi is None else hi.lo))


def _dia_core_df(win_h, win_l, base, tr, offsets, vh_ref, vl_ref):
    """DF DIA tile multiply off the chunk-resident padded iterate —
    the ops/pallas_fused_pipe._dia_core shape rules, DF-ized (each
    aligned operand is an (hi, lo) pair rolled/selected identically;
    accumulation via df_fma, one compensation per slab)."""
    from mpi_bicgstab_tpu.ops.precision import df_fma
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANES), 1)
    acc = _df(jnp.zeros((tr, _LANES), jnp.float32),
              jnp.zeros((tr, _LANES), jnp.float32))
    for w, o in enumerate(offsets):
        q_, s_ = divmod(o, _LANES)
        if s_ == 0:
            ah = win_h[pl.ds(base + q_, tr), :]
            al = win_l[pl.ds(base + q_, tr), :]
        else:
            r_h = win_h[pl.ds(base + q_, tr + 1), :]
            r_l = win_l[pl.ds(base + q_, tr + 1), :]
            ro_h = pltpu.roll(r_h, np.int32(_LANES - s_), axis=1)
            ro_l = pltpu.roll(r_l, np.int32(_LANES - s_), axis=1)
            sel = lane < _LANES - s_
            ah = jnp.where(sel, ro_h[:tr], ro_h[1:])
            al = jnp.where(sel, ro_l[:tr], ro_l[1:])
        acc = df_fma(acc, _df(vh_ref[w], vl_ref[w]), _df(ah, al))
    return acc


def _start_window(i, CH, tr, src_h, src_l, win_h, win_l, sem_h, sem_l):
    """At a chunk head, DMA the (chunk + halo) window of the padded
    iterate; grid steps run sequentially so the scratch persists for
    the chunk's remaining tiles."""
    wr = win_h.shape[0]

    @pl.when(i % CH == 0)
    def _():
        row0 = (i // CH) * (CH * tr)
        d1 = pltpu.make_async_copy(src_h.at[pl.ds(row0, wr), :],
                                   win_h, sem_h)
        d2 = pltpu.make_async_copy(src_l.at[pl.ds(row0, wr), :],
                                   win_l, sem_l)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()


def _phase_a_kernel(sc_ref, wp_h, wp_l, vh_ref, vl_ref,
                    rh_, rl_, ph_, pl_, sh_, sl_, zh_, zl_, vh2_, vl2_,
                    th, tl, p2h, p2l, s2h, s2l, z2h, z2l, qh, ql,
                    yh, yl, dots_ref, win_h, win_l, sem_h, sem_l,
                    *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    _start_window(i, CH, tr, wp_h, wp_l, win_h, win_l, sem_h, sem_l)
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    beta = _df_scalar(sc_ref[2], sc_ref[3])
    omega = _df_scalar(sc_ref[4], sc_ref[5])

    base = (i % CH) * tr + plr
    t = _dia_core_df(win_h, win_l, base, tr, offsets, vh_ref, vl_ref)
    w = _df(win_h[pl.ds(base, tr), :], win_l[pl.ds(base, tr), :])
    r = _df(rh_[...], rl_[...])
    p = _df(ph_[...], pl_[...])
    s = _df(sh_[...], sl_[...])
    z = _df(zh_[...], zl_[...])
    v = _df(vh2_[...], vl2_[...])
    z2 = df_fma(t, beta, df_fma(z, -omega, v))      # solver.c:358-360
    p2 = df_fma(r, beta, df_fma(p, -omega, s))      # solver.c:352-354
    s2 = df_fma(w, beta, df_fma(s, -omega, z))      # solver.c:355-357
    q = df_fma(r, -alpha, s2)                       # solver.c:361
    y = df_fma(w, -alpha, z2)                       # solver.c:362
    th[...], tl[...] = t.hi, t.lo
    p2h[...], p2l[...] = p2.hi, p2.lo
    s2h[...], s2l[...] = s2.hi, s2.lo
    z2h[...], z2l[...] = z2.hi, z2.lo
    qh[...], ql[...] = q.hi, q.lo
    yh[...], yl[...] = y.hi, y.lo
    dots_ref[...] = _dot_row_df([_tile_df_dot(q, y),
                                 _tile_df_dot(y, y)])


def _phase_b_kernel(sc_ref, zp_h, zp_l, vh_ref, vl_ref,
                    xh_, xl_, p2h_, p2l_, qh_, ql_, yh_, yl_,
                    th_, tl_, rhh_, rhl_, s2h_, s2l_,
                    v2h, v2l, x2h, x2l, r2h, r2l, w2h, w2l,
                    dots_ref, win_h, win_l, sem_h, sem_l,
                    *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    _start_window(i, CH, tr, zp_h, zp_l, win_h, win_l, sem_h, sem_l)
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    omega = _df_scalar(sc_ref[2], sc_ref[3])

    base = (i % CH) * tr + plr
    v2 = _dia_core_df(win_h, win_l, base, tr, offsets, vh_ref, vl_ref)
    z2 = _df(win_h[pl.ds(base, tr), :], win_l[pl.ds(base, tr), :])
    x = _df(xh_[...], xl_[...])
    p2 = _df(p2h_[...], p2l_[...])
    q = _df(qh_[...], ql_[...])
    y = _df(yh_[...], yl_[...])
    t = _df(th_[...], tl_[...])
    rh = _df(rhh_[...], rhl_[...])
    s2 = _df(s2h_[...], s2l_[...])
    w2 = df_fma(y, -omega, df_fma(t, -alpha, v2))   # solver.c:374-375
    x2 = df_fma(df_fma(x, alpha, p2), omega, q)     # solver.c:370-371
    r2 = df_fma(q, -omega, y)                       # solver.c:372
    v2h[...], v2l[...] = v2.hi, v2.lo
    x2h[...], x2l[...] = x2.hi, x2.lo
    r2h[...], r2l[...] = r2.hi, r2.lo
    w2h[...], w2l[...] = w2.hi, w2.lo
    dots_ref[...] = _dot_row_df([
        _tile_df_dot(r2, r2), _tile_df_dot(rh, r2),
        _tile_df_dot(rh, w2), _tile_df_dot(rh, s2),
        _tile_df_dot(rh, z2)])


def _common_specs(W, tr, n_stream, n_out):
    tile = lambda: pl.BlockSpec((tr, _LANES), lambda i: (i, 0),  # noqa
                                memory_space=pltpu.VMEM)
    vspec = lambda: pl.BlockSpec((W, tr, _LANES),  # noqa: E731
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                vspec(), vspec()] + [tile() for _ in range(n_stream)]
    out_specs = tuple([tile() for _ in range(n_out)]
                      + [pl.BlockSpec((1, _SUB, _LANES),
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)])
    return in_specs, out_specs


def _run_phase(kernel, vals, resident_df, streams_df, scalars, offsets,
               n_out_df, interpret):
    from mpi_bicgstab_tpu.ops.precision import DF
    n = resident_df.hi.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    src_h, src_l = _pad_rows(resident_df, plr, phr)
    flat = []
    for d in streams_df:
        flat.append(d.hi.reshape(nr, _LANES))
        flat.append(d.lo.reshape(nr, _LANES))
    in_specs, out_specs = _common_specs(W, tr, len(flat), 2 * n_out_df)
    outs = pl.pallas_call(
        partial(kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)]
            * (2 * n_out_df)
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32),
                        pltpu.VMEM((wr, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(scalars, src_h, src_l,
      vals.hi.reshape(W, nr, _LANES), vals.lo.reshape(W, nr, _LANES),
      *flat)
    dfs = [DF(outs[2 * j].reshape(n), outs[2 * j + 1].reshape(n))
           for j in range(n_out_df)]
    return dfs, outs[-1]


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_phase_a_full(vals, w, r, p, s, z, v, scalars, offsets: tuple,
                       interpret: bool = False):
    """scalars: [a.hi, a.lo, b.hi, b.lo, o.hi, o.lo]. Returns
    (t, p2, s2, z2, q, y, qTy, yTy); t = A w computed in-kernel."""
    dfs, dots = _run_phase(_phase_a_kernel, vals, w, (r, p, s, z, v),
                           scalars, offsets, 6, interpret)
    t, p2, s2, z2, q, y = dfs
    qTy, yTy = _sum_dot_rows(dots, 2)
    return t, p2, s2, z2, q, y, qTy, yTy


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_phase_b_full(vals, z2, x, p2, q, y, t, r_hat, s2, scalars,
                       offsets: tuple, interpret: bool = False):
    """scalars: [a.hi, a.lo, o.hi, o.lo]. Returns (v2, x2, r2, w2,
    dot_r, rTr, rhTw, rhTs, rhTz); v2 = A z2 computed in-kernel."""
    dfs, dots = _run_phase(_phase_b_kernel, vals, z2,
                           (x, p2, q, y, t, r_hat, s2),
                           scalars, offsets, 4, interpret)
    v2, x2, r2, w2 = dfs
    d = _sum_dot_rows(dots, 5)
    return (v2, x2, r2, w2) + tuple(d)


def pipe_bicgstab_fused_df_full(A: DiaMatrix, b, x0, cfg,
                                interpret=False):
    """df32 pipelined BiCGStab, two fully-fused Pallas kernels per
    iteration (SpMVs in-kernel). Mathematically the reference
    pipe_bicgstab (solver.c:292-417) with identical update order; the
    carry drops t and v (t lives within the iteration, v' is phase B
    output). Pads internally to the tile grid (zero rows are inert)."""
    from jax import lax

    from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
    from mpi_bicgstab_tpu.ops.precision import (DF, df_dot, df_zeros,
                                                vvalue)
    from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult

    n0 = b.hi.shape[0]
    blk = _TR * _LANES
    n = -(-n0 // blk) * blk
    vals = A.vals
    if n != n0:
        vals = DF(jnp.pad(vals.hi, ((0, 0), (0, n - n0))),
                  jnp.pad(vals.lo, ((0, 0), (0, n - n0))))
        b = DF(jnp.pad(b.hi, (0, n - n0)), jnp.pad(b.lo, (0, n - n0)))
        x0 = DF(jnp.pad(x0.hi, (0, n - n0)),
                jnp.pad(x0.lo, (0, n - n0)))
    Ap = DiaMatrix(vals, A.offsets, n, n)
    offsets = A.offsets

    tol2 = jnp.asarray(cfg.tol, jnp.float32) ** 2
    max_iter = cfg.max_iter

    r0 = b - dia_spmv_df(Ap, x0)
    r_hat = r0
    w0 = dia_spmv_df(Ap, r0)
    rTr0 = df_dot(r0, r0)
    rTw0 = df_dot(r0, w0)
    alpha0 = rTr0 / rTw0
    zero_s = df_zeros(())
    zv = df_zeros((n,))
    dot_zero = rTr0
    hist0 = jnp.full((max_iter,), jnp.nan, jnp.float32)

    def cond(c):
        (k, x, r, w, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (vvalue(dot_r) > vvalue(dot_zero) * tol2) & (k < max_iter)

    def body(c):
        (k, x, r, w, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        t, p2, s2, z2, q, y, qTy, yTy = fused_phase_a_full(
            vals, w, r, p, s, z, v,
            jnp.stack([alpha.hi, alpha.lo, beta.hi, beta.lo,
                       omega.hi, omega.lo]),
            offsets, interpret=interpret)
        omega2 = qTy / yTy                          # solver.c:369
        v2, x2, r2, w2, dot_new, rTr_new, rhTw, rhTs, rhTz = \
            fused_phase_b_full(
                vals, z2, x, p2, q, y, t, r_hat, s2,
                jnp.stack([alpha.hi, alpha.lo, omega2.hi, omega2.lo]),
                offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:387
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, w2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, zv, zv, zv, zv, alpha0, zero_s,
        zero_s, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[12], out[13]
    rel = jnp.sqrt(vvalue(dot_r) / vvalue(dot_zero))
    # true-residual gate on `converged` (solvers/base.SolveResult doc):
    # one XLA DF SpMV at exit, outside the iteration loop
    r_true = b - dia_spmv_df(Ap, x)
    true_relres = jnp.sqrt(vvalue(df_dot(r_true, r_true))
                           / vvalue(dot_zero))
    return SolveResult(
        x=DF(x.hi[:n0], x.lo[:n0]), n_iter=k, final_relres=rel,
        history=jnp.sqrt(hist / vvalue(dot_zero)),
        converged=(vvalue(dot_r) <= vvalue(dot_zero) * tol2)
        & (true_relres <= 100.0 * jnp.sqrt(tol2)),
        true_relres=true_relres)


def pipe_bicgstab_rr_fused_df_full(A: DiaMatrix, b, x0, cfg,
                                   interpret=False):
    """df32 pipelined BiCGStab + residual replacement with the
    fully-fused phases on recurrence iterations (reference
    solver.c:433-576). The rare replacement iterations (at most
    cfg.nrr, every cfg.krr steps) lax.cond into an XLA DF branch
    (s <- A p, z <- A s, r <- b - A x, w <- A r) over an identical
    carry — the hard-regime pipe+RR curve gets the fused speed."""
    from jax import lax

    from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
    from mpi_bicgstab_tpu.ops.precision import (DF, df_dot, df_zeros,
                                                vfma, vvalue)
    from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult

    n0 = b.hi.shape[0]
    blk = _TR * _LANES
    n = -(-n0 // blk) * blk
    vals = A.vals
    if n != n0:
        vals = DF(jnp.pad(vals.hi, ((0, 0), (0, n - n0))),
                  jnp.pad(vals.lo, ((0, 0), (0, n - n0))))
        b = DF(jnp.pad(b.hi, (0, n - n0)), jnp.pad(b.lo, (0, n - n0)))
        x0 = DF(jnp.pad(x0.hi, (0, n - n0)),
                jnp.pad(x0.lo, (0, n - n0)))
    Ap = DiaMatrix(vals, A.offsets, n, n)
    offsets = A.offsets

    tol2 = jnp.asarray(cfg.tol, jnp.float32) ** 2
    max_iter = cfg.max_iter
    krr, nrr = cfg.krr, cfg.nrr

    r0 = b - dia_spmv_df(Ap, x0)
    r_hat = r0
    w0 = dia_spmv_df(Ap, r0)
    rTr0 = df_dot(r0, r0)
    rTw0 = df_dot(r0, w0)
    alpha0 = rTr0 / rTw0
    zero_s = df_zeros(())
    zv = df_zeros((n,))
    dot_zero = rTr0
    hist0 = jnp.full((max_iter,), jnp.nan, jnp.float32)

    def cond(c):
        (k, x, r, w, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (vvalue(dot_r) > vvalue(dot_zero) * tol2) & (k < max_iter)

    def fused_body(c):
        (k, x, r, w, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        t, p2, s2, z2, q, y, qTy, yTy = fused_phase_a_full(
            vals, w, r, p, s, z, v,
            jnp.stack([alpha.hi, alpha.lo, beta.hi, beta.lo,
                       omega.hi, omega.lo]),
            offsets, interpret=interpret)
        omega2 = qTy / yTy
        v2, x2, r2, w2, dot_new, rTr_new, rhTw, rhTs, rhTz = \
            fused_phase_b_full(
                vals, z2, x, p2, q, y, t, r_hat, s2,
                jnp.stack([alpha.hi, alpha.lo, omega2.hi, omega2.lo]),
                offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, w2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    def rr_body(c):
        (k, x, r, w, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        p2 = vfma(r, beta, vfma(p, -omega, s))      # solver.c:494-496
        s2 = dia_spmv_df(Ap, p2)                    # solver.c:499
        z2 = dia_spmv_df(Ap, s2)                    # solver.c:500
        q = vfma(r, -alpha, s2)                     # solver.c:510
        y = vfma(w, -alpha, z2)                     # solver.c:511
        qTy = df_dot(q, y)
        yTy = df_dot(y, y)
        v2 = dia_spmv_df(Ap, z2)                    # solver.c:514
        omega2 = qTy / yTy
        x2 = vfma(vfma(x, alpha, p2), omega2, q)    # solver.c:519-520
        r2 = b - dia_spmv_df(Ap, x2)                # solver.c:523-525
        w2 = dia_spmv_df(Ap, r2)                    # solver.c:526
        dot_new = df_dot(r2, r2)
        rTr_new = df_dot(r_hat, r2)
        rhTw = df_dot(r_hat, w2)
        rhTs = df_dot(r_hat, s2)
        rhTz = df_dot(r_hat, z2)
        beta2 = (alpha / omega2) * (rTr_new / rTr)
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, w2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    def body(c):
        k = c[0]
        is_rr = (k % krr == 0) & (k > 0) & (k <= krr * nrr)
        return lax.cond(is_rr, rr_body, fused_body, c)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, zv, zv, zv, zv, alpha0, zero_s,
        zero_s, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[12], out[13]
    rel = jnp.sqrt(vvalue(dot_r) / vvalue(dot_zero))
    # true-residual gate on `converged` (solvers/base.SolveResult doc)
    r_true = b - dia_spmv_df(Ap, x)
    true_relres = jnp.sqrt(vvalue(df_dot(r_true, r_true))
                           / vvalue(dot_zero))
    return SolveResult(
        x=DF(x.hi[:n0], x.lo[:n0]), n_iter=k, final_relres=rel,
        history=jnp.sqrt(hist / vvalue(dot_zero)),
        converged=(vvalue(dot_r) <= vvalue(dot_zero) * tol2)
        & (true_relres <= 100.0 * jnp.sqrt(tol2)),
        true_relres=true_relres)
