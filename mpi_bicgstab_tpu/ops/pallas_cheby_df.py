"""Fused Chebyshev-chain kernel, df32 (double-float) variant.

Same window-resident chain as ops/pallas_cheby.py — ONE Pallas pass
runs all d+1 band multiplies and x/r/d recurrences per chunk off a
(chunk + d*halo) window DMA'd once — with every stream doubled
(hi, lo) and all in-kernel arithmetic through the error-free-transform
DF ops (ops/precision; exact under Mosaic, probed round 2). Step
coefficients are full-precision DF literals split at trace time
(ops/cheby.df_const — the same polynomial as the XLA DF chain).

The df32 solve path needs the preconditioner applied in DF arithmetic:
an f32-internal p(A) has ~2^-24-scale input-dependent rounding, i.e.
the operator the Krylov iteration sees is only f32-linear, and the
recurrence/true-residual gap then floors at f32 levels — defeating
df32's purpose (same reason the shift-update and fused-iteration
kernels carry DF variants).

VMEM: 8 vector windows (x/r/d/y x hi/lo) + 2W value streams — about
double the f32 chain, so chunks are half as deep and wide-offset
stencils fall back to the XLA chain sooner (same efficiency gate).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_cheby import (_LANES, _SLACK, _TR,
                                               _apply_window,
                                               _budget_rows,
                                               _vmem_budget)
from mpi_bicgstab_tpu.ops.pallas_fused_pipe_df import _df, _df_scalar
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows


def _pick_chunk_df(G: int, W: int, offsets, degree: int) -> int:
    budget = _vmem_budget()
    for c in range(min(G, 32), 0, -1):
        if G % c:
            continue
        _, _, wr = _budget_rows(offsets, degree, c)
        vec_b = 8 * wr * _LANES * 4          # x,r,d,y windows, hi+lo
        vals_b = 2 * W * wr * _LANES * 4
        if vec_b + vals_b <= budget:
            return c
    return 0


def format_ok(A, dtype, degree: int) -> bool:
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not isinstance(A, DiaMatrix) or not is_df(A.vals):
        return False
    if dtype != jnp.float32 or A.n_rows != A.n_cols or degree < 1:
        return False
    n = -(-A.n_rows // (_TR * _LANES)) * (_TR * _LANES)
    G = n // _LANES // _TR
    CH = _pick_chunk_df(G, A.n_diags, A.offsets, degree)
    if CH == 0:
        return False
    _, _, wr = _budget_rows(A.offsets, degree, CH)
    return 2 * CH * _TR >= wr      # same efficiency gate as the f32 chain


def available(A, dtype, degree: int) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CHEBY", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype, degree)


def _dia_window_df(sh, sl, vh, vl, base: int, rows: int, offsets):
    """rows of A @ src (DF) at window rows [base, base+rows) — the
    _dia_core_df access pattern over a resident window + resident DF
    value streams, df_fma accumulation."""
    from mpi_bicgstab_tpu.ops.precision import df_fma
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    acc = _df(jnp.zeros((rows, _LANES), jnp.float32),
              jnp.zeros((rows, _LANES), jnp.float32))
    for w, o in enumerate(offsets):
        q_, s_ = divmod(o, _LANES)
        if s_ == 0:
            ah = sh[pl.ds(base + q_, rows), :]
            al = sl[pl.ds(base + q_, rows), :]
        else:
            r_h = sh[pl.ds(base + q_, rows + 1), :]
            r_l = sl[pl.ds(base + q_, rows + 1), :]
            ro_h = pltpu.roll(r_h, np.int32(_LANES - s_), axis=1)
            ro_l = pltpu.roll(r_l, np.int32(_LANES - s_), axis=1)
            sel = lane < _LANES - s_
            ah = jnp.where(sel, ro_h[:rows], ro_h[1:])
            al = jnp.where(sel, ro_l[:rows], ro_l[1:])
        acc = df_fma(acc, _df(vh[w, pl.ds(base, rows), :],
                              vl[w, pl.ds(base, rows), :]),
                     _df(ah, al))
    return acc


def _cheby_kernel_df(vph, vpl, valsph, valspl, xh_ref, xl_ref,
                     xh, xl, rh, rl, dh, dl, yh, yl, vals_h, vals_l,
                     sem_vh, sem_vl, sem_mh, sem_ml,
                     *, offsets, coeffs, inv_theta, h_lo, CH, plr, phr):
    from mpi_bicgstab_tpu.ops.precision import df_fma
    c = pl.program_id(0)
    wr = xh.shape[0]
    row0 = c * (CH * _TR)
    dmas = [pltpu.make_async_copy(vph.at[pl.ds(row0, wr), :], rh, sem_vh),
            pltpu.make_async_copy(vpl.at[pl.ds(row0, wr), :], rl, sem_vl),
            pltpu.make_async_copy(valsph.at[:, pl.ds(row0, wr), :],
                                  vals_h, sem_mh),
            pltpu.make_async_copy(valspl.at[:, pl.ds(row0, wr), :],
                                  vals_l, sem_ml)]
    for d_ in dmas:
        d_.start()
    for d_ in dmas:
        d_.wait()

    it = _df_scalar(*inv_theta)
    lo_r, hi_r = plr, wr - phr - 1
    # x = v / theta (v lives in the r window until overwritten)
    x0 = df_fma(_df(jnp.zeros_like(rh[...]), jnp.zeros_like(rl[...])),
                it, _df(rh[...], rl[...]))
    xh[...] = x0.hi
    xl[...] = x0.lo

    def _init(base, rows):
        ax = _dia_window_df(xh, xl, vals_h, vals_l, base, rows, offsets)
        rr = df_fma(_df(rh[pl.ds(base, rows), :],
                        rl[pl.ds(base, rows), :]),
                    _df_scalar(-1.0, 0.0), ax)
        rh[pl.ds(base, rows), :] = rr.hi
        rl[pl.ds(base, rows), :] = rr.lo
        d0 = df_fma(_df(jnp.zeros((rows, _LANES), jnp.float32),
                        jnp.zeros((rows, _LANES), jnp.float32)), it, rr)
        dh[pl.ds(base, rows), :] = d0.hi
        dl[pl.ds(base, rows), :] = d0.lo

    _apply_window(_init, lo_r, hi_r)

    for (c_d, c_r) in coeffs:
        def _mult(base, rows):
            y = _dia_window_df(dh, dl, vals_h, vals_l, base, rows,
                               offsets)
            yh[pl.ds(base, rows), :] = y.hi
            yl[pl.ds(base, rows), :] = y.lo

        _apply_window(_mult, lo_r, hi_r)

        def _update(base, rows, c_d=c_d, c_r=c_r):
            sl_ = pl.ds(base, rows)
            d_old = _df(dh[sl_, :], dl[sl_, :])
            x_new = df_fma(_df(xh[sl_, :], xl[sl_, :]),
                           _df_scalar(1.0, 0.0), d_old)
            xh[sl_, :] = x_new.hi
            xl[sl_, :] = x_new.lo
            r_new = df_fma(_df(rh[sl_, :], rl[sl_, :]),
                           _df_scalar(-1.0, 0.0),
                           _df(yh[sl_, :], yl[sl_, :]))
            rh[sl_, :] = r_new.hi
            rl[sl_, :] = r_new.lo
            zero = _df(jnp.zeros((rows, _LANES), jnp.float32),
                       jnp.zeros((rows, _LANES), jnp.float32))
            d_new = df_fma(df_fma(zero, _df_scalar(*c_d), d_old),
                           _df_scalar(*c_r), r_new)
            dh[sl_, :] = d_new.hi
            dl[sl_, :] = d_new.lo

        _apply_window(_update, lo_r, hi_r)

    xh_ref[...] = xh[pl.ds(h_lo, CH * _TR), :]
    xl_ref[...] = xl[pl.ds(h_lo, CH * _TR), :]


@partial(jax.jit, static_argnames=("offsets", "degree", "lo", "hi",
                                   "interpret"))
def cheby_chain_df(vals_df, v_df, offsets: tuple, degree: int,
                   lo: float, hi: float, interpret: bool = False):
    """x = p(A) v in df32 — the whole degree-d application as ONE
    Pallas pass. Matches ops/cheby.cheby_apply's DF build (same
    df_const coefficients) to DF rounding."""
    from mpi_bicgstab_tpu.ops.cheby import _coeffs
    from mpi_bicgstab_tpu.ops.precision import DF
    inv_theta_f, pairs_f = _coeffs(degree, lo, hi)

    def _split(c):
        # host-float split (same values as ops/cheby.df_const, but as
        # python literals — jnp arrays would be tracers here)
        h = float(np.float32(c))
        return (h, float(np.float32(c - h)))

    inv_theta = _split(inv_theta_f)
    coeffs = tuple((_split(c_d), _split(c_r)) for c_d, c_r in pairs_f)

    n0 = v_df.hi.shape[0]
    blk = _TR * _LANES
    n = -(-n0 // blk) * blk
    vh_, vl_ = v_df.hi, v_df.lo
    mh_, ml_ = vals_df.hi, vals_df.lo
    if n != n0:
        vh_ = jnp.pad(vh_, (0, n - n0))
        vl_ = jnp.pad(vl_, (0, n - n0))
        mh_ = jnp.pad(mh_, ((0, 0), (0, n - n0)))
        ml_ = jnp.pad(ml_, ((0, 0), (0, n - n0)))
    nr = n // _LANES
    G = nr // _TR
    W = len(offsets)
    CH = _pick_chunk_df(G, W, offsets, degree)
    if CH == 0:
        raise ValueError("cheby_chain_df: window does not fit VMEM")
    plr, phr = _halo_rows(offsets)
    h_lo, h_hi, wr = _budget_rows(offsets, degree, CH)

    def _padrows(a):
        out = jnp.zeros((h_lo + nr + h_hi + _SLACK, _LANES), jnp.float32)
        return out.at[h_lo:h_lo + nr, :].set(a.reshape(nr, _LANES))

    def _padvals(a):
        out = jnp.zeros((W, h_lo + nr + h_hi + _SLACK, _LANES),
                        jnp.float32)
        return out.at[:, h_lo:h_lo + nr, :].set(a.reshape(W, nr, _LANES))

    outs = pl.pallas_call(
        partial(_cheby_kernel_df, offsets=offsets, coeffs=coeffs,
                inv_theta=inv_theta, h_lo=h_lo, CH=CH, plr=plr,
                phr=phr),
        grid=(G // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec((CH * _TR, _LANES), lambda c: (c, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),) * 2,
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 8
        + [pltpu.VMEM((W, wr, _LANES), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA(())] * 4,
        interpret=interpret,
    )(_padrows(vh_), _padrows(vl_), _padvals(mh_), _padvals(ml_))
    xh, xl = outs
    return DF(xh.reshape(n)[:n0], xl.reshape(n)[:n0])
