"""Pallas SpMV over the windowed-ELL layout (ops/window_ell.py) — the
fast path for unstructured-but-clustered matrices that RCM cannot band.

Per (row-tile, slab) the kernel resolves 1024 arbitrary gathers from the
tile's [8,128] column window with TWO chained hardware gathers (the only
fast dynamic gathers Mosaic has, see window_ell.py's header):

  t1[i, lam] = window[sub_sel[i, lam], lam]     (sublane dynamic_gather)
  xg[i, j]   = t1[i, lane_idx[i, j]]            (lane    dynamic_gather)
             = window[sub_sel[i, lane_idx[i,j]], lane_idx[i,j]]
             = x[column of row (i,j)'s slab-w entry]

correct because the build made lane classes injective per (tile,
sublane-row, slab), so sub_sel is well defined at lane lane_idx[i,j].

Structure (v2 — the v1 one-tile-per-grid-step layout was grid-overhead
bound at ~1 Gnnz/s): the iterate is DMA'd HBM->VMEM once and stays
resident (6.4 MB at 1.6M rows); each grid step processes TB=16 row
tiles x all W slabs from double-buffered metadata blocks, slicing each
tile's [8,128] window out of the resident iterate with a dynamic
sublane slice (base indices scalar-prefetched).

Role: the unstructured-matrix `mult` (reference matrix.c:498-516).
Measured on the v5e: see docs/RESULTS_TPU.md (round 2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.window_ell import WindowEllMatrix

_LANES = 128
_SUB = 8
_TB = 16           # row tiles per grid step


def _kernel(base_ref, x_hbm, ss_ref, li_ref, v_ref, y_ref, xv, sem,
            *, W, TB):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm, xv, sem)
        dma.start()
        dma.wait()

    for tb in range(TB):
        base = base_ref[step * TB + tb]
        win = xv[pl.ds(pl.multiple_of(base * _SUB, _SUB), _SUB), :]
        acc = jnp.zeros((_SUB, _LANES), v_ref.dtype)
        for w in range(W):
            ss = ss_ref[w, tb].astype(jnp.int32)
            li = li_ref[w, tb].astype(jnp.int32)
            t1 = jnp.take_along_axis(win, ss, axis=0)
            xg = jnp.take_along_axis(t1, li, axis=1)
            acc = acc + v_ref[w, tb] * xg
        y_ref[tb] = acc


@partial(jax.jit, static_argnames=("interpret",))
def _window_spmv_core(sub_sel, lane_idx, vals, window_base, x2d,
                      interpret: bool = False):
    W, T = vals.shape[:2]
    TB = _TB
    Tp = -(-T // TB) * TB
    if Tp != T:
        pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
        sub_sel = jnp.pad(sub_sel, pad)
        lane_idx = jnp.pad(lane_idx, pad)
        vals = jnp.pad(vals, pad)
        window_base = jnp.pad(window_base, (0, Tp - T))
    R = x2d.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x2d stays HBM
            pl.BlockSpec((W, TB, _SUB, _LANES),
                         lambda s, base: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, TB, _SUB, _LANES),
                         lambda s, base: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, TB, _SUB, _LANES),
                         lambda s, base: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, _SUB, _LANES),
                               lambda s, base: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, _LANES), vals.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    y = pl.pallas_call(
        partial(_kernel, W=W, TB=TB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, _SUB, _LANES), vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size,
            bytes_accessed=vals.size * 6 + x2d.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(window_base, x2d, sub_sel, lane_idx, vals)
    return y[:T].reshape(T * _SUB * _LANES)


def _x_to_2d(x, n_cols: int, R: int):
    """[n_cols] -> [R,128]; R (static, from the build) covers every
    window slice; padding reads are inert because padded vals are 0."""
    xp = jnp.zeros((R * _LANES,), x.dtype).at[:n_cols].set(x[:n_cols])
    return xp.reshape(R, _LANES)


def _df_kernel(base_ref, xh_hbm, xl_hbm, ss_ref, li_ref, vh_ref, vl_ref,
               yh_ref, yl_ref, xvh, xvl, semh, seml, *, W, TB):
    """Double-float variant: same two-gather structure on the hi/lo
    pairs, DF multiply-accumulate in-kernel (Mosaic preserves the
    error-free transforms bit-exactly — ops/precision.py header)."""
    from mpi_bicgstab_tpu.ops.precision import DF, df_add, df_mul
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        d1 = pltpu.make_async_copy(xh_hbm, xvh, semh)
        d2 = pltpu.make_async_copy(xl_hbm, xvl, seml)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

    for tb in range(TB):
        base = base_ref[step * TB + tb]
        winh = xvh[pl.ds(pl.multiple_of(base * _SUB, _SUB), _SUB), :]
        winl = xvl[pl.ds(pl.multiple_of(base * _SUB, _SUB), _SUB), :]
        acc = DF(jnp.zeros((_SUB, _LANES), jnp.float32),
                 jnp.zeros((_SUB, _LANES), jnp.float32))
        for w in range(W):
            ss = ss_ref[w, tb].astype(jnp.int32)
            li = li_ref[w, tb].astype(jnp.int32)
            gh = jnp.take_along_axis(
                jnp.take_along_axis(winh, ss, axis=0), li, axis=1)
            gl = jnp.take_along_axis(
                jnp.take_along_axis(winl, ss, axis=0), li, axis=1)
            acc = df_add(acc, df_mul(DF(vh_ref[w, tb], vl_ref[w, tb]),
                                     DF(gh, gl)))
        yh_ref[tb] = acc.hi
        yl_ref[tb] = acc.lo


@partial(jax.jit, static_argnames=("interpret",))
def _window_spmv_df_core(sub_sel, lane_idx, vals_hi, vals_lo,
                         window_base, x2dh, x2dl, interpret: bool = False):
    W, T = vals_hi.shape[:2]
    TB = _TB
    Tp = -(-T // TB) * TB
    if Tp != T:
        pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
        sub_sel = jnp.pad(sub_sel, pad)
        lane_idx = jnp.pad(lane_idx, pad)
        vals_hi = jnp.pad(vals_hi, pad)
        vals_lo = jnp.pad(vals_lo, pad)
        window_base = jnp.pad(window_base, (0, Tp - T))
    R = x2dh.shape[0]
    tile = lambda: pl.BlockSpec((W, TB, _SUB, _LANES),  # noqa: E731
                                lambda s, base: (0, s, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  tile(), tile(), tile(), tile()],
        out_specs=(pl.BlockSpec((TB, _SUB, _LANES),
                                lambda s, base: (s, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TB, _SUB, _LANES),
                                lambda s, base: (s, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    yh, yl = pl.pallas_call(
        partial(_df_kernel, W=W, TB=TB),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((Tp, _SUB, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((Tp, _SUB, _LANES), jnp.float32)),
        interpret=interpret,
    )(window_base, x2dh, x2dl, sub_sel, lane_idx, vals_hi, vals_lo)
    n = T * _SUB * _LANES
    return yh[:T].reshape(n), yl[:T].reshape(n)


def window_spmv_df(A: WindowEllMatrix, x, interpret: bool = False):
    """Double-float y = A @ x over the windowed-ELL layout (A.vals and
    x are DF pairs). Tail spill goes through the XLA DF gather path."""
    from mpi_bicgstab_tpu.ops.precision import DF, df_add, df_mul
    x2dh = _x_to_2d(x.hi, A.n_cols, A.x_rows)
    x2dl = _x_to_2d(x.lo, A.n_cols, A.x_rows)
    yh, yl = _window_spmv_df_core(A.sub_sel, A.lane_idx, A.vals.hi,
                                  A.vals.lo, A.window_base, x2dh, x2dl,
                                  interpret=interpret)
    y = DF(yh, yl)
    if A.tail_size:
        # one segment_sum PER DUPLICATE-RANK LEVEL: within a level each
        # row appears at most once, so the f32 segment_sum only PLACES
        # values (exact); the cross-level combination is a DF add.
        # A flat segment_sum was measured losing the low parts
        # (5.7e-9 rel error on multi-entry tail rows). Static
        # tail_counts shrink each level to its real entries (the
        # deeper levels are tiny — see window_ell.WindowEllMatrix).
        for d in range(A.tail_rows.shape[0]):
            c = (A.tail_counts[d] if d < len(A.tail_counts)
                 else A.tail_rows.shape[1])
            if c == 0:
                continue
            tr = A.tail_rows[d, :c]
            tc = A.tail_cols[d, :c]
            xt = DF(x.hi[tc], x.lo[tc])
            t = df_mul(DF(A.tail_vals.hi[d, :c], A.tail_vals.lo[d, :c]),
                       xt)
            y = df_add(y, DF(
                jax.ops.segment_sum(t.hi, tr, num_segments=A.n_rows),
                jax.ops.segment_sum(t.lo, tr, num_segments=A.n_rows)))
    return y


def window_spmv(A: WindowEllMatrix, x: jax.Array,
                interpret: bool = False) -> jax.Array:
    """y = A @ x (f32/f64 values). x: [n_cols] -> y: [n_rows].

    The COO tail (out-of-window / over-width spill) goes through the
    XLA gather+segment-sum path — small by construction (ops/layout.py
    only selects this format when the tail fraction is tiny)."""
    x2d = _x_to_2d(x.astype(A.vals.dtype), A.n_cols, A.x_rows)
    y = _window_spmv_core(A.sub_sel, A.lane_idx, A.vals, A.window_base,
                          x2d, interpret=interpret)
    if A.tail_size:
        if A.tail_counts:
            # exact-size flat via the static per-level counts: entries
            # are front-packed per level, so this drops the [L, cap]
            # rectangle's ~5x zero padding before the (scatter-bound)
            # segment_sum — restoring the 15.5+ Gnnz/s headline that
            # the padded flat had dragged to 4.3 (VERDICT r3 weak #2)
            rows = jnp.concatenate([A.tail_rows[d, :c]
                                    for d, c in enumerate(A.tail_counts)
                                    if c])
            cols = jnp.concatenate([A.tail_cols[d, :c]
                                    for d, c in enumerate(A.tail_counts)
                                    if c])
            vals = jnp.concatenate([A.tail_vals[d, :c]
                                    for d, c in enumerate(A.tail_counts)
                                    if c])
        else:        # distributed shards / legacy layouts: padded flat
            rows = A.tail_rows.reshape(-1)
            cols = A.tail_cols.reshape(-1)
            vals = A.tail_vals.reshape(-1)
        y = y + jax.ops.segment_sum(vals * x[cols], rows,
                                    num_segments=A.n_rows)
    return y
