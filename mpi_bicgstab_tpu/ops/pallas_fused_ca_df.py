"""df32 CA-BiCGStab with fully-fused iteration passes.

Completes the df32 fused matrix (bicgstab: pallas_fused_classic_df,
pipe: pallas_fused_pipe_df2): the communication-avoiding
rearrangement (reference solver.c:160-278) as TWO Pallas passes per
iteration with the DF DIA SpMVs in-kernel and its two reduction
points between them:

  K1:  p' = r + beta (p - omega s)       (center tiles, DF)
       s' = w + beta (s - omega z)       (computed in-window, DF)
       z' = A s'                         (DF DIA core)
       q  = r - alpha s'
       y  = w - alpha z'
       DF partials (q, y), (y, y)
  K2:  r' = q - omega y                  (computed in-window, DF)
       w' = A r'                         (DF DIA core)
       x' = x + alpha p' + omega q       (center tiles, DF)
       DF partials (r',r'), (r#,r'), (r#,w'), (r#,s'), (r#,z')

Window streaming and the EFT/compensation rules follow
ops/pallas_fused_classic_df.py (chunk cap 8 here: K1 holds five DF
source window pairs plus the result pair). Scope: square DF
DiaMatrix, canonical df32 config; api._solve_jit dispatches for
method='ca_bicgstab' when `available()` holds and MBT_FUSED_CA_DF is
not '0'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_classic_df import (_load_windows,
                                                          _vspec)
from mpi_bicgstab_tpu.ops.pallas_fused_classic import (_dots_spec,
                                                       _tile_spec)
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import (_df, _df_scalar,
                                                       _dot_row_df,
                                                       _sum_dot_rows,
                                                       _tile_df_dot)
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import (_dia_core_df,
                                                        _pad_rows)
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_SUB = 8
_TR = 64
_SLACK = 8


def _chunk_tiles(G: int) -> int:
    """Largest divisor of G that is <= 8 (K1 holds 5 DF source window
    pairs + 1 result pair = 12 buffers)."""
    for c in range(min(G, 8), 0, -1):
        if G % c == 0:
            return c
    return 1


def format_ok(A, dtype) -> bool:
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
    win_b = 12 * wr * _LANES * 4
    vals_b = 2 * 2 * A.n_diags * _TR * _LANES * 4
    stream_b = 2 * 22 * _TR * _LANES * 4
    return win_b + vals_b + stream_b <= 13 * 1024 * 1024


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CA_DF", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype)


def _k1_kernel(sc_ref, rp_h, rp_l, pp_h, pp_l, sp_h, sp_l, wp_h, wp_l,
               zp_h, zp_l, vh_ref, vl_ref,
               p2h, p2l, s2h, s2l, z2h, z2l, qh, ql, yh, yl, dots_ref,
               rw_h, rw_l, pw_h, pw_l, sw_h, sw_l, ww_h, ww_l,
               zw_h, zw_l, nw_h, nw_l,
               m1, m2, m3, m4, m5, m6, m7, m8, m9, m10,
               *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    beta = _df_scalar(sc_ref[2], sc_ref[3])
    omega = _df_scalar(sc_ref[4], sc_ref[5])
    _load_windows(i, CH, tr,
                  (rp_h, rp_l, pp_h, pp_l, sp_h, sp_l, wp_h, wp_l,
                   zp_h, zp_l),
                  (rw_h, rw_l, pw_h, pw_l, sw_h, sw_l, ww_h, ww_l,
                   zw_h, zw_l),
                  (m1, m2, m3, m4, m5, m6, m7, m8, m9, m10))

    @pl.when(i % CH == 0)
    def _():
        # solver.c:220-222 — s' is the SpMV input: whole window
        sn = df_fma(_df(ww_h[...], ww_l[...]), beta,
                    df_fma(_df(sw_h[...], sw_l[...]), -omega,
                           _df(zw_h[...], zw_l[...])))
        nw_h[...], nw_l[...] = sn.hi, sn.lo

    base = (i % CH) * tr + plr
    z2 = _dia_core_df(nw_h, nw_l, base, tr, offsets, vh_ref, vl_ref)
    ctr = pl.ds(base, tr)
    r = _df(rw_h[ctr, :], rw_l[ctr, :])
    w = _df(ww_h[ctr, :], ww_l[ctr, :])
    s2t = _df(nw_h[ctr, :], nw_l[ctr, :])
    p2 = df_fma(r, beta, df_fma(_df(pw_h[ctr, :], pw_l[ctr, :]),
                                -omega,
                                _df(sw_h[ctr, :], sw_l[ctr, :])))
    q = df_fma(r, -alpha, s2t)                      # solver.c:225
    y = df_fma(w, -alpha, z2)                       # solver.c:226
    p2h[...], p2l[...] = p2.hi, p2.lo
    s2h[...], s2l[...] = s2t.hi, s2t.lo
    z2h[...], z2l[...] = z2.hi, z2.lo
    qh[...], ql[...] = q.hi, q.lo
    yh[...], yl[...] = y.hi, y.lo
    dots_ref[...] = _dot_row_df([_tile_df_dot(q, y),
                                 _tile_df_dot(y, y)])


def _k2_kernel(sc_ref, qp_h, qp_l, yp_h, yp_l, vh_ref, vl_ref,
               xh_, xl_, p2h_, p2l_, rhh_, rhl_, s2h_, s2l_,
               z2h_, z2l_,
               x2h, x2l, r2h, r2l, w2h, w2l, dots_ref,
               qw_h, qw_l, yw_h, yw_l, nw_h, nw_l,
               m1, m2, m3, m4,
               *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    omega = _df_scalar(sc_ref[2], sc_ref[3])
    _load_windows(i, CH, tr, (qp_h, qp_l, yp_h, yp_l),
                  (qw_h, qw_l, yw_h, yw_l), (m1, m2, m3, m4))

    @pl.when(i % CH == 0)
    def _():
        rn = df_fma(_df(qw_h[...], qw_l[...]), -omega,
                    _df(yw_h[...], yw_l[...]))      # solver.c:235
        nw_h[...], nw_l[...] = rn.hi, rn.lo

    base = (i % CH) * tr + plr
    w2 = _dia_core_df(nw_h, nw_l, base, tr, offsets, vh_ref, vl_ref)
    ctr = pl.ds(base, tr)
    q = _df(qw_h[ctr, :], qw_l[ctr, :])
    r2 = _df(nw_h[ctr, :], nw_l[ctr, :])
    x = _df(xh_[...], xl_[...])
    p2 = _df(p2h_[...], p2l_[...])
    rh = _df(rhh_[...], rhl_[...])
    s2 = _df(s2h_[...], s2l_[...])
    z2 = _df(z2h_[...], z2l_[...])
    x2 = df_fma(df_fma(x, alpha, p2), omega, q)     # solver.c:233-234
    x2h[...], x2l[...] = x2.hi, x2.lo
    r2h[...], r2l[...] = r2.hi, r2.lo
    w2h[...], w2l[...] = w2.hi, w2.lo
    dots_ref[...] = _dot_row_df([
        _tile_df_dot(r2, r2), _tile_df_dot(rh, r2),
        _tile_df_dot(rh, w2), _tile_df_dot(rh, s2),
        _tile_df_dot(rh, z2)])


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_ca_k1_df(vals, r, p, s, w, z, scalars, offsets: tuple,
                   interpret: bool = False):
    """scalars = [a.hi,a.lo,b.hi,b.lo,o.hi,o.lo]. Returns
    (p2, s2, z2, q, y, qTy, yTy) as DF."""
    from mpi_bicgstab_tpu.ops.precision import DF
    n = r.hi.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    srcs = []
    for v in (r, p, s, w, z):
        h, l = _pad_rows(v, plr, phr)
        srcs += [h, l]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 10
                + [_vspec(W, tr), _vspec(W, tr)])
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 10 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 10
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 12
        + [pltpu.SemaphoreType.DMA(())] * 10,
        interpret=interpret,
    )(scalars, *srcs,
      vals.hi.reshape(W, nr, _LANES), vals.lo.reshape(W, nr, _LANES))
    dfs = [DF(outs[2 * j].reshape(n), outs[2 * j + 1].reshape(n))
           for j in range(5)]
    qTy, yTy = _sum_dot_rows(outs[10], 2)
    return tuple(dfs) + (qTy, yTy)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_ca_k2_df(vals, q, y, x, p2, r_hat, s2, z2, scalars,
                   offsets: tuple, interpret: bool = False):
    """scalars = [a.hi,a.lo,o.hi,o.lo]. Returns (x2, r2, w2, dot_r,
    rTr, rhTw, rhTs, rhTz)."""
    from mpi_bicgstab_tpu.ops.precision import DF
    n = q.hi.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    srcs = []
    for v in (q, y):
        h, l = _pad_rows(v, plr, phr)
        srcs += [h, l]
    flat = []
    for v in (x, p2, r_hat, s2, z2):
        flat += [v.hi.reshape(nr, _LANES), v.lo.reshape(nr, _LANES)]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                + [_vspec(W, tr), _vspec(W, tr)]
                + [_tile_spec(tr)] * 10)
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 6 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 6
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 6
        + [pltpu.SemaphoreType.DMA(())] * 4,
        interpret=interpret,
    )(scalars, *srcs,
      vals.hi.reshape(W, nr, _LANES), vals.lo.reshape(W, nr, _LANES),
      *flat)
    x2 = DF(outs[0].reshape(n), outs[1].reshape(n))
    r2 = DF(outs[2].reshape(n), outs[3].reshape(n))
    w2 = DF(outs[4].reshape(n), outs[5].reshape(n))
    d = _sum_dot_rows(outs[6], 5)
    return (x2, r2, w2) + tuple(d)


def ca_bicgstab_fused_df(A: DiaMatrix, b, x0, cfg, interpret=False):
    """df32 CA-BiCGStab, two fully-fused Pallas passes per iteration
    (DF SpMVs in-kernel). Reference solver.c:160-278 with identical
    update order; pads internally to the tile grid."""
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

    r0 = b - dia_spmv_df(Ap, x0)            # solver.c:200-201
    r_hat = r0                              # solver.c:202
    w0 = dia_spmv_df(Ap, r0)                # solver.c:205
    rTr0 = df_dot(r0, r0)
    rTw0 = df_dot(r0, w0)                   # solver.c:203-208
    alpha0 = rTr0 / rTw0                    # solver.c:210
    dot_zero = rTr0
    zero_s = df_zeros(())
    zv = df_zeros((n,))
    hist0 = jnp.full((max_iter,), jnp.nan, jnp.float32)

    def cond(c):
        (k, x, r, w, p, s, z, alpha, beta, omega, rTr, dot_r, hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (vvalue(dot_r) > vvalue(dot_zero) * tol2) & (k < max_iter)

    def body(c):
        (k, x, r, w, p, s, z, alpha, beta, omega, rTr, dot_r, hist) = c
        p2, s2, z2, q, y, qTy, yTy = fused_ca_k1_df(
            vals, r, p, s, w, z,
            jnp.stack([alpha.hi, alpha.lo, beta.hi, beta.lo,
                       omega.hi, omega.lo]),
            offsets, interpret=interpret)
        omega2 = qTy / yTy                              # solver.c:232
        x2, r2, w2, dot_new, rTr_new, rhTw, rhTs, rhTz = fused_ca_k2_df(
            vals, q, y, x, p2, r_hat, s2, z2,
            jnp.stack([alpha.hi, alpha.lo, omega2.hi, omega2.lo]),
            offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)      # solver.c:248
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, w2, p2, s2, z2, alpha2, beta2, omega2,
                rTr_new, dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, zv, zv, zv, alpha0, zero_s, zero_s,
        rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[11], out[12]
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
