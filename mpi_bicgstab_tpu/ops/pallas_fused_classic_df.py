"""df32 classic BiCGStab with FULLY-fused iteration passes.

The classic solver is the convergence workhorse of the hard regime
(1.6M-row transport_hard df32: classic 2,982 iterations to 5.6e-15
while plain pipe stagnates — docs/RESULTS_TPU.md), but its df32 XLA
build pays two DF SpMV passes plus every BLAS-1 fusion boundary per
iteration. This module runs the iteration as THREE Pallas passes with
the DF DIA SpMVs in-kernel (reference solver.c:86-119 update order):

  K1:  p' = r + beta (p - omega s)    (DF, computed in-window)
       s' = A p'                      (DF DIA core over the window)
       partial (r#, s')
  K2:  q  = r - alpha s'              (DF, computed in-window)
       y  = A q                       (DF DIA core)
       partials (q, y), (y, y)
  K3:  x' = x + alpha p' + omega q    (pure streaming DF pass)
       r' = q - omega y
       partials (r', r'), (r#, r')

Window streaming follows ops/pallas_fused_pipe_df2.py: grid row-tiles
group into chunks; each chunk head DMAs the (chunk + band halo)
windows of the DF source vectors into VMEM scratch and computes the
SpMV input over the whole window (halo rows recompute redundantly but
identically). All in-kernel arithmetic uses the error-free-transform
DF ops (exact under Mosaic, probed round 2); dot partials use the
compensated tile reduction and the grid axis folds with the
compensated df_sum tree.

Scope: square DF DiaMatrix, canonical df32 config (dtype float32),
single device; api._solve_jit dispatches for method='bicgstab' when
`available()` holds and MBT_FUSED_CLASSIC_DF is not '0'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import (_df, _df_scalar,
                                                       _dot_row_df,
                                                       _sum_dot_rows,
                                                       _tile_df_dot)
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df2 import (_dia_core_df,
                                                        _pad_rows)
from mpi_bicgstab_tpu.ops.pallas_fused_classic import (_LANES, _SLACK,
                                                       _SUB, _TR,
                                                       _dots_spec,
                                                       _tile_spec)
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows


def _chunk_tiles(G: int) -> int:
    """Largest divisor of G that is <= 16 (DF windows come in pairs;
    a smaller chunk keeps 3 source pairs + 1 result pair under VMEM)."""
    for c in range(min(G, 16), 0, -1):
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
    win_b = 8 * wr * _LANES * 4                 # 3 src pairs + 1 result
    vals_b = 2 * 2 * A.n_diags * _TR * _LANES * 4
    stream_b = 2 * 14 * _TR * _LANES * 4
    return win_b + vals_b + stream_b <= 13 * 1024 * 1024


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CLASSIC_DF", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype)


def _load_windows(i, CH, tr, srcs, wins, sems):
    """At a chunk head, DMA each padded source's (chunk + halo) window
    into its VMEM scratch (srcs/wins/sems are flat hi,lo interleaved)."""
    wr = wins[0].shape[0]

    @pl.when(i % CH == 0)
    def _():
        row0 = (i // CH) * (CH * tr)
        dmas = [pltpu.make_async_copy(s.at[pl.ds(row0, wr), :], w, sem)
                for s, w, sem in zip(srcs, wins, sems)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


def _k1_kernel(sc_ref, rp_h, rp_l, pp_h, pp_l, sp_h, sp_l,
               vh_ref, vl_ref, rhh_, rhl_,
               p2h, p2l, s2h, s2l, dots_ref,
               rw_h, rw_l, pw_h, pw_l, sw_h, sw_l, nw_h, nw_l,
               sem1, sem2, sem3, sem4, sem5, sem6,
               *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    beta = _df_scalar(sc_ref[0], sc_ref[1])
    omega = _df_scalar(sc_ref[2], sc_ref[3])
    _load_windows(i, CH, tr, (rp_h, rp_l, pp_h, pp_l, sp_h, sp_l),
                  (rw_h, rw_l, pw_h, pw_l, sw_h, sw_l),
                  (sem1, sem2, sem3, sem4, sem5, sem6))

    @pl.when(i % CH == 0)
    def _():
        # solver.c:117-119 deferred to the next iteration's K1
        # (identical expression, beta=omega=0 on the first)
        pn = df_fma(_df(rw_h[...], rw_l[...]), beta,
                    df_fma(_df(pw_h[...], pw_l[...]), -omega,
                           _df(sw_h[...], sw_l[...])))
        nw_h[...], nw_l[...] = pn.hi, pn.lo

    base = (i % CH) * tr + plr
    s2 = _dia_core_df(nw_h, nw_l, base, tr, offsets, vh_ref, vl_ref)
    p2 = _df(nw_h[pl.ds(base, tr), :], nw_l[pl.ds(base, tr), :])
    rh = _df(rhh_[...], rhl_[...])
    p2h[...], p2l[...] = p2.hi, p2.lo
    s2h[...], s2l[...] = s2.hi, s2.lo
    dots_ref[...] = _dot_row_df([_tile_df_dot(rh, s2)])  # solver.c:89-91


def _k2_kernel(sc_ref, rp_h, rp_l, sp_h, sp_l, vh_ref, vl_ref,
               qh, ql, yh, yl, dots_ref,
               rw_h, rw_l, sw_h, sw_l, qw_h, qw_l,
               sem1, sem2, sem3, sem4,
               *, offsets, plr, CH, tr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    i = pl.program_id(0)
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    _load_windows(i, CH, tr, (rp_h, rp_l, sp_h, sp_l),
                  (rw_h, rw_l, sw_h, sw_l), (sem1, sem2, sem3, sem4))

    @pl.when(i % CH == 0)
    def _():
        qn = df_fma(_df(rw_h[...], rw_l[...]), -alpha,
                    _df(sw_h[...], sw_l[...]))          # solver.c:94
        qw_h[...], qw_l[...] = qn.hi, qn.lo

    base = (i % CH) * tr + plr
    y = _dia_core_df(qw_h, qw_l, base, tr, offsets, vh_ref, vl_ref)
    q = _df(qw_h[pl.ds(base, tr), :], qw_l[pl.ds(base, tr), :])
    qh[...], ql[...] = q.hi, q.lo
    yh[...], yl[...] = y.hi, y.lo
    dots_ref[...] = _dot_row_df([_tile_df_dot(q, y),
                                 _tile_df_dot(y, y)])


def _k3_kernel(sc_ref, xh_, xl_, p2h_, p2l_, qh_, ql_, yh_, yl_,
               rhh_, rhl_, x2h, x2l, r2h, r2l, dots_ref):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    alpha = _df_scalar(sc_ref[0], sc_ref[1])
    omega = _df_scalar(sc_ref[2], sc_ref[3])
    x = _df(xh_[...], xl_[...])
    p2 = _df(p2h_[...], p2l_[...])
    q = _df(qh_[...], ql_[...])
    y = _df(yh_[...], yl_[...])
    rh = _df(rhh_[...], rhl_[...])
    x2 = df_fma(df_fma(x, alpha, p2), omega, q)     # solver.c:105-106
    r2 = df_fma(q, -omega, y)                       # solver.c:107
    x2h[...], x2l[...] = x2.hi, x2.lo
    r2h[...], r2l[...] = r2.hi, r2.lo
    dots_ref[...] = _dot_row_df([_tile_df_dot(r2, r2),
                                 _tile_df_dot(rh, r2)])


def _vspec(W, tr):
    return pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k1_df(vals, r, p, s, r_hat, scalars, offsets: tuple,
                interpret: bool = False, halos=None):
    """scalars = [b.hi, b.lo, o.hi, o.lo]. Returns (p2, s2, rhTs).

    halos: optional (r_lo, r_hi, p_lo, p_hi, s_lo, s_hi) DF pairs of
    neighbor band-edge values for the distributed halo-fused path
    (solvers/fused_dist); rhTs is then the LOCAL partial to psum."""
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
    for i, v in enumerate((r, p, s)):
        hp = (halos[2 * i:2 * i + 2] if halos is not None
              else (None, None))
        h, l = _pad_rows(v, plr, phr, *hp)
        srcs += [h, l]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 6
                + [_vspec(W, tr), _vspec(W, tr),
                   _tile_spec(tr), _tile_spec(tr)])
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 4 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 8
        + [pltpu.SemaphoreType.DMA(())] * 6,
        interpret=interpret,
    )(scalars, *srcs,
      vals.hi.reshape(W, nr, _LANES), vals.lo.reshape(W, nr, _LANES),
      r_hat.hi.reshape(nr, _LANES), r_hat.lo.reshape(nr, _LANES))
    p2 = DF(outs[0].reshape(n), outs[1].reshape(n))
    s2 = DF(outs[2].reshape(n), outs[3].reshape(n))
    (rhTs,) = _sum_dot_rows(outs[4], 1)
    return p2, s2, rhTs


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k2_df(vals, r, s2, scalars, offsets: tuple,
                interpret: bool = False, halos=None):
    """scalars = [a.hi, a.lo]. Returns (q, y, qTy, yTy).

    halos: optional (r_lo, r_hi, s_lo, s_hi) DF pairs (see
    fused_k1_df)."""
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
    for i, v in enumerate((r, s2)):
        hp = (halos[2 * i:2 * i + 2] if halos is not None
              else (None, None))
        h, l = _pad_rows(v, plr, phr, *hp)
        srcs += [h, l]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                + [_vspec(W, tr), _vspec(W, tr)])
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 4 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 6
        + [pltpu.SemaphoreType.DMA(())] * 4,
        interpret=interpret,
    )(scalars, *srcs,
      vals.hi.reshape(W, nr, _LANES), vals.lo.reshape(W, nr, _LANES))
    q = DF(outs[0].reshape(n), outs[1].reshape(n))
    y = DF(outs[2].reshape(n), outs[3].reshape(n))
    qTy, yTy = _sum_dot_rows(outs[4], 2)
    return q, y, qTy, yTy


@partial(jax.jit, static_argnames=("interpret",))
def fused_k3_df(x, p2, q, y, r_hat, scalars, interpret: bool = False):
    """scalars = [a.hi, a.lo, o.hi, o.lo]. Returns (x2, r2, dot_r,
    rTr_new)."""
    from mpi_bicgstab_tpu.ops.precision import DF
    n = x.hi.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    flat = []
    for v in (x, p2, q, y, r_hat):
        flat += [v.hi.reshape(nr, _LANES), v.lo.reshape(nr, _LANES)]
    outs = pl.pallas_call(
        _k3_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_tile_spec(tr)] * 10,
        out_specs=tuple([_tile_spec(tr)] * 4 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        interpret=interpret,
    )(scalars, *flat)
    x2 = DF(outs[0].reshape(n), outs[1].reshape(n))
    r2 = DF(outs[2].reshape(n), outs[3].reshape(n))
    dot_r, rTr = _sum_dot_rows(outs[4], 2)
    return x2, r2, dot_r, rTr


def bicgstab_fused_df(A: DiaMatrix, b, x0, cfg, interpret=False):
    """df32 classic BiCGStab, three fully-fused Pallas passes per
    iteration (DF SpMVs in-kernel). Reference solver.c:35-146 with the
    end-of-loop p-update deferred to the next iteration's K1 (identical
    expression, beta=omega=0 on the first). Pads internally to the
    tile grid (zero rows are inert)."""
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

    r0 = b - dia_spmv_df(Ap, x0)            # solver.c:74-75
    r_hat = r0                              # solver.c:76
    rTr0 = df_dot(r0, r0)                   # solver.c:78-80
    dot_zero = rTr0
    zero_s = df_zeros(())
    zv = df_zeros((n,))
    hist0 = jnp.full((max_iter,), jnp.nan, jnp.float32)

    def cond(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (vvalue(dot_r) > vvalue(dot_zero) * tol2) & (k < max_iter)

    def body(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        p2, s2, rhTs = fused_k1_df(
            vals, r, p, s, r_hat,
            jnp.stack([beta.hi, beta.lo, omega.hi, omega.lo]),
            offsets, interpret=interpret)
        alpha = rTr / rhTs                              # solver.c:93
        q, y, qTy, yTy = fused_k2_df(
            vals, r, s2, jnp.stack([alpha.hi, alpha.lo]), offsets,
            interpret=interpret)
        omega2 = qTy / yTy                              # solver.c:104
        x2, r2, dot_new, rTr_new = fused_k3_df(
            x, p2, q, y, r_hat,
            jnp.stack([alpha.hi, alpha.lo, omega2.hi, omega2.lo]),
            interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)      # solver.c:116
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, p2, s2, beta2, omega2, rTr_new,
                dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, zv, zv, zero_s, zero_s, rTr0, rTr0,
        hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[8], out[9]
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
