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

The window itself is fetched by the Mosaic pipeline: the x2d BlockSpec's
index_map reads the per-tile window base from a scalar-prefetch operand,
so the [8,128] window DMA overlaps the previous tile's compute.

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


def _kernel(base_ref, x2d_ref, ss_ref, li_ref, v_ref, y_ref):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    window = x2d_ref[...]                                   # [8,128]
    ss = ss_ref[0, 0].astype(jnp.int32)                     # [8,128]
    li = li_ref[0, 0].astype(jnp.int32)
    t1 = jnp.take_along_axis(window, ss, axis=0)
    xg = jnp.take_along_axis(t1, li, axis=1)
    y_ref[...] = y_ref[...] + (v_ref[0, 0] * xg)[None]


@partial(jax.jit, static_argnames=("interpret",))
def _window_spmv_f32(sub_sel, lane_idx, vals, window_base, x2d,
                     interpret: bool = False):
    W, T = vals.shape[:2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, W),
        in_specs=[
            pl.BlockSpec((_SUB, _LANES),
                         lambda t, w, base: (base[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANES),
                         lambda t, w, base: (w, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANES),
                         lambda t, w, base: (w, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANES),
                         lambda t, w, base: (w, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, _LANES),
                               lambda t, w, base: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, _SUB, _LANES), vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size,
            bytes_accessed=vals.size * 6 + x2d.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(window_base, x2d, sub_sel, lane_idx, vals)
    return y.reshape(T * _SUB * _LANES)


def _x_to_2d(x, n_cols: int, R: int):
    """[n_cols] -> [R,128]; R (static, from the build) covers every
    window slice; padding reads are inert because padded vals are 0."""
    xp = jnp.zeros((R * _LANES,), x.dtype).at[:n_cols].set(x[:n_cols])
    return xp.reshape(R, _LANES)


def window_spmv(A: WindowEllMatrix, x: jax.Array,
                interpret: bool = False) -> jax.Array:
    """y = A @ x (f32/f64 values). x: [n_cols] -> y: [n_rows].

    The COO tail (out-of-window / over-width spill) goes through the
    XLA gather+segment-sum path — small by construction (ops/layout.py
    only selects this format when the tail fraction is tiny)."""
    x2d = _x_to_2d(x.astype(A.vals.dtype), A.n_cols, A.x_rows)
    y = _window_spmv_f32(A.sub_sel, A.lane_idx, A.vals, A.window_base,
                         x2d, interpret=interpret)
    if A.tail_size:
        tail = A.tail_vals * x[A.tail_cols]
        y = y + jax.ops.segment_sum(tail, A.tail_rows,
                                    num_segments=A.n_rows)
    return y


def window_spmv_df(A: WindowEllMatrix, x, interpret: bool = False):
    """Double-float y = A @ x: gathers run on hi/lo with the same
    indices; products/sums use DF arithmetic outside the kernel would
    lose the fusion, so hi/lo each run the f32 kernel on the SPLIT
    products: y = sum_w v*xg is NOT DF-associative per slab — instead
    gather hi/lo and do the DF multiply-accumulate in XLA over slab
    outputs would need per-slab gathers. v1: gather hi and lo through
    the kernel with vals set to the DF product parts is not exact;
    therefore DF mode routes each COMPONENT gather through the kernel
    with unit vals and does DF math outside (2 kernel calls + W-slab
    DF fma), trading some fusion for exactness."""
    raise NotImplementedError(
        "df32 windowed-ELL lands with the df32 kernel pass; "
        "build_operator keeps df32 unstructured matrices on gather-ELL")
