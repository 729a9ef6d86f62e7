"""Pallas kernels for the butterfly-routed SpMV (ops/butterfly.py).

Three streamed kernels around two XLA element transposes; every
random access is a chained [8,128] sublane+lane dynamic_gather within
a window that is either resident (K1: the iterate, 6.4 MB) or the
currently streamed block (K2, K3). Measured primitive rates on the
v5e: ~14-16 Gelem/s per gather pass, transposes ~806 GB/s
(scripts/probe_shuffle.py).

  K1: u1[a] = gather from x window k1_src[a] (dynamic sublane slice of
      the DMA'd-resident iterate — the pallas_window_spmv pattern).
  K2: within-window permute of the transposed buffer.
  K3: per 128-lane output row, gather entry values from the row's
      stacked (128//rb) dest windows, multiply the ELL value slabs,
      accumulate y. The stacked sublane index spans [0, 8*stack);
      take_along_axis is limited to 8 sublanes, so the gather runs
      per-8-row part with a select chain (same measured rate).

x and all metadata stream sequentially — the pipeline is pure
sequential HBM traffic plus in-register shuffles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.butterfly import _B, _LANES, _SUB, ButterflyMatrix

_TB = 16     # windows per grid step (grid-overhead lesson)


def _tb_windows(P: int) -> int:
    """Windows per grid step for K1/K2. Measured on the v5e at 1.6M
    (scripts/r4_gather_probe*.py): the K2 kernel runs 655 us at TB=16
    but 289-298 us at TB=128-256 — per-step overhead (DMA issue +
    revisiting) dominates small blocks. P is a multiple of 1024, so
    256 always divides it; the ladder keeps tiny interpret-mode test
    grids working."""
    for tb in (256, 128, 64, 32):
        if P % tb == 0:
            return tb
    return _TB


def _tb_rows(NR: int) -> int:
    """Row-tiles per K3 grid step: largest divisor of NR (K3 is
    gather-op bound, but TB=40 still measured ~8% over TB=16)."""
    for tb in (64, 48, 40, 32, 24):
        if NR % tb == 0:
            return tb
    return _TB


def _vmem_ok(bf: ButterflyMatrix, df: bool) -> bool:
    """K1 holds the padded iterate VMEM-resident ONE PLANE AT A TIME —
    the DF pipeline routes the hi and lo streams through separate
    _route_part kernel calls (6.4 MB resident each at 1.6M), so the
    budget is per-plane for f32 and df32 alike. (The old 2x-df model
    wrongly gated the Pallas path off at the 1.6M headline scale and
    sent df32 solves down the XLA gather fallback, which kernel-faults
    the TPU worker inside fori_loop chains there — round 5.) Large
    distributed rectangular layouts (nc_pad = GLOBAL columns) still
    fall back to XLA instead of failing Mosaic compilation mid-solve."""
    del df  # per-plane residency: same budget for f32 and DF pairs
    return bf.nc_pad * 4 <= 10 * 1024 * 1024


def available(bf: ButterflyMatrix, dtype) -> bool:
    import os
    if os.environ.get("MBT_BUTTERFLY", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return (dtype == jnp.float32 and not hasattr(bf.k3_vals, "hi")
            and _vmem_ok(bf, df=False))


# ---------------------------------------------------------------------------
# K1 — build u1 from the resident iterate
# ---------------------------------------------------------------------------

def _k1_kernel(src_ref, x_hbm, ss_ref, li_ref, u1_ref, xv, sem, *, TB):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm, xv, sem)
        dma.start()
        dma.wait()

    for tb in range(TB):
        base = src_ref[step * TB + tb]
        win = xv[pl.ds(pl.multiple_of(base * _SUB, _SUB), _SUB), :]
        ss = ss_ref[tb].astype(jnp.int32)
        li = li_ref[tb].astype(jnp.int32)
        t1 = jnp.take_along_axis(win, ss, axis=0)
        u1_ref[tb] = jnp.take_along_axis(t1, li, axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def _k1(k1_src, k1_sub, k1_lane, x2d, interpret=False):
    P = k1_sub.shape[0]
    R = x2d.shape[0]
    TB = _tb_windows(P)
    tile = lambda: pl.BlockSpec((TB, _SUB, _LANES),  # noqa: E731
                                lambda s, src: (s, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), tile(), tile()],
        out_specs=tile(),
        scratch_shapes=[pltpu.VMEM((R, _LANES), x2d.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        partial(_k1_kernel, TB=TB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, _SUB, _LANES), x2d.dtype),
        interpret=interpret,
    )(k1_src, x2d, k1_sub, k1_lane)


# ---------------------------------------------------------------------------
# K2 — within-window permute of the streamed transposed buffer
# ---------------------------------------------------------------------------

def _k2_kernel(m_ref, ss_ref, li_ref, o_ref, *, TB):
    for tb in range(TB):
        win = m_ref[tb]
        ss = ss_ref[tb].astype(jnp.int32)
        li = li_ref[tb].astype(jnp.int32)
        t1 = jnp.take_along_axis(win, ss, axis=0)
        o_ref[tb] = jnp.take_along_axis(t1, li, axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def _k2(mid, k2_sub, k2_lane, interpret=False):
    P = mid.shape[0]
    TB = _tb_windows(P)
    tile = lambda: pl.BlockSpec((TB, _SUB, _LANES),  # noqa: E731
                                lambda s: (s, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_k2_kernel, TB=TB),
        grid=(P // TB,),
        in_specs=[tile(), tile(), tile()],
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((P, _SUB, _LANES), mid.dtype),
        interpret=interpret,
    )(mid, k2_sub, k2_lane)


# ---------------------------------------------------------------------------
# K3 — gather + multiply + accumulate from streamed dest windows
# ---------------------------------------------------------------------------

def _k3_kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *, C, F, TB,
               variant="lane"):
    # Mosaic's sublane dynamic_gather needs MATCHED [8,128] shapes, so
    # slabs process in chunks of 8.
    #
    # Which of the F stacked windows an entry reads is a STATIC
    # function of its OUTPUT lane: the router stores
    # sub3 = (row % 128)//rb * 8 + slot//128 (butterfly.py "element
    # final slot"), and window = (row % 128)//rb = out_lane // rb by
    # construction for every layout the router can build. The round-4
    # kernel resolved the window DYNAMICALLY from the ss values with a
    # min/clip/where chain, which a round-5 variant sweep measured at
    # ~610 us of the 1186 us K3 at 1.6M (MBT_K3_VARIANT traces,
    # docs/RESULTS_TPU.md §Round 5); the "lane" default replaces it
    # with per-window gathers selected by a broadcasted-iota lane
    # mask — sublane/lane takes measured ~free next to the dynamic
    # chain.
    #
    # Probe variants (MBT_K3_VARIANT): "select" is the old dynamic
    # chain (correct, slow); "single" reads window 0 only (the F=1
    # timing ceiling, numerically wrong for F>1); "masked" models a
    # per-slab class-split router (wrong axis — kept for the probe
    # record).
    rbk = _LANES // F                       # output rows per window
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
    sub_iota = None
    if variant == "masked":
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    for tb in range(TB):
        stacked = z_ref[pl.ds(tb * _SUB * F, _SUB * F), :]
        acc = jnp.zeros((_SUB, _LANES), v_ref.dtype)
        for c in range(C):
            ss = ss_ref[c, :, tb].astype(jnp.int32)      # [8, 128]
            li = li_ref[c, :, tb].astype(jnp.int32)
            if variant == "lane":
                ss7 = jnp.bitwise_and(ss, _SUB - 1)
                xg = jnp.take_along_axis(
                    jnp.take_along_axis(stacked[0:_SUB, :], ss7,
                                        axis=0), li, axis=1)
                for f in range(1, F):
                    xf = jnp.take_along_axis(
                        jnp.take_along_axis(
                            stacked[f * _SUB:(f + 1) * _SUB, :], ss7,
                            axis=0), li, axis=1)
                    xg = jnp.where(lane_iota >= f * rbk, xf, xg)
                acc = acc + v_ref[c, :, tb] * xg
                continue
            if variant == "single":
                g = jnp.take_along_axis(
                    stacked[0:_SUB, :],
                    jnp.bitwise_and(ss, _SUB - 1), axis=0)
            elif variant == "masked":
                ss7 = jnp.bitwise_and(ss, _SUB - 1)
                g = jnp.take_along_axis(stacked[0:_SUB, :], ss7, axis=0)
                for f in range(1, F):
                    part = jnp.take_along_axis(
                        stacked[f * _SUB:(f + 1) * _SUB, :], ss7, axis=0)
                    g = jnp.where(sub_iota >= (_SUB // F) * f, part, g)
            else:
                g = jnp.take_along_axis(
                    stacked[0:_SUB, :], jnp.minimum(ss, _SUB - 1), axis=0)
                for f in range(1, F):
                    part = jnp.take_along_axis(
                        stacked[f * _SUB:(f + 1) * _SUB, :],
                        jnp.clip(ss - f * _SUB, 0, _SUB - 1), axis=0)
                    g = jnp.where(ss >= f * _SUB, part, g)
            xg = jnp.take_along_axis(g, li, axis=1)
            acc = acc + v_ref[c, :, tb] * xg
        y_ref[tb] = jnp.sum(acc, axis=0)


@partial(jax.jit, static_argnames=("F", "interpret"))
def _k3(z2d, k3_sub, k3_lane, k3_vals, F: int, interpret=False):
    # tables arrive kernel-ready [C, 8, NR, 128] (ButterflyMatrix
    # round-5 storage: reshaping [W, n_pad] here re-materialized a
    # ~150 MB relayout inside every solver iteration once operators
    # became jit arguments)
    C, _, NR, _ = k3_vals.shape
    TB = _tb_rows(NR)
    tile = lambda: pl.BlockSpec((C, _SUB, TB, _LANES),  # noqa: E731
                                lambda s: (0, 0, s, 0),
                                memory_space=pltpu.VMEM)
    import os
    y = pl.pallas_call(
        partial(_k3_kernel, C=C, F=F, TB=TB,
                variant=os.environ.get("MBT_K3_VARIANT", "lane")),
        grid=(NR // TB,),
        in_specs=[pl.BlockSpec((TB * _SUB * F, _LANES),
                               lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
                  tile(), tile(), tile()],
        out_specs=pl.BlockSpec((TB, _LANES), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NR, _LANES), k3_vals.dtype),
        interpret=interpret,
    )(z2d, k3_sub, k3_lane, k3_vals)
    return y.reshape(NR * _LANES)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("interpret",))
def _pipeline(bf: ButterflyMatrix, x, interpret=False):
    n_pad, P = bf.n_pad, bf.P
    xp = jnp.zeros((bf.nc_pad,), x.dtype).at[: bf.n_cols].set(
        x[: bf.n_cols])
    x2d = xp.reshape(bf.nc_pad // _LANES, _LANES)
    u1 = _k1(bf.k1_src, bf.k1_sub, bf.k1_lane, x2d,
             interpret=interpret)                       # [P, 8, 128]
    mid = u1.reshape(P, _B).T.reshape(P, _SUB, _LANES)  # T1 (one copy)
    z1 = _k2(mid, bf.k2_sub, bf.k2_lane, interpret=interpret)
    z = z1.reshape(P, _B).T.reshape(P * _SUB, _LANES)   # T2 (one copy)
    F = bf.stack
    y = _k3(z, bf.k3_sub, bf.k3_lane, bf.k3_vals, F=F,
            interpret=interpret)
    if bf.tail_n:
        tail = (bf.tail_vals * xp[bf.tail_cols]).reshape(-1)
        y = y + jax.ops.segment_sum(tail, bf.tail_rows.reshape(-1),
                                    num_segments=n_pad)
    return y


def butterfly_spmv(bf: ButterflyMatrix, x, interpret: bool = False):
    """y = A @ x over the butterfly-routed layout (f32). Returns
    [n_pad] (padded rows are zero); callers slice [: n_rows]."""
    return _pipeline(bf, x, interpret=interpret)


# ---------------------------------------------------------------------------
# df32 variant — K1/K2/transposes are pure data movement (exact), so
# they run verbatim on the hi and lo streams; only K3 (the multiply +
# accumulate) needs DF arithmetic (EFTs in-kernel, exact under Mosaic)
# ---------------------------------------------------------------------------

def available_df(bf: ButterflyMatrix, dtype) -> bool:
    import os
    if os.environ.get("MBT_BUTTERFLY", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return (dtype == jnp.float32 and hasattr(bf.k3_vals, "hi")
            and _vmem_ok(bf, df=True))


def _gather_stacked(stacked, ss, li, F):
    # window = out_lane // rb is STATIC in the output lane (same
    # invariant as _k3_kernel's "lane" default; the old dynamic
    # min/clip/where chain on ss cost ~610 us/spmv at 1.6M)
    rbk = _LANES // F
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
    ss7 = jnp.bitwise_and(ss, _SUB - 1)
    xg = jnp.take_along_axis(
        jnp.take_along_axis(stacked[0:_SUB, :], ss7, axis=0), li,
        axis=1)
    for f in range(1, F):
        xf = jnp.take_along_axis(
            jnp.take_along_axis(stacked[f * _SUB:(f + 1) * _SUB, :],
                                ss7, axis=0), li, axis=1)
        xg = jnp.where(lane_iota >= f * rbk, xf, xg)
    return xg


def _k3_df_kernel(zh_ref, zl_ref, ss_ref, li_ref, vh_ref, vl_ref,
                  yh_ref, yl_ref, *, C, F, TB):
    from mpi_bicgstab_tpu.ops.precision import DF, df_fma, two_sum
    for tb in range(TB):
        sh = zh_ref[pl.ds(tb * _SUB * F, _SUB * F), :]
        sl = zl_ref[pl.ds(tb * _SUB * F, _SUB * F), :]
        acc = DF(jnp.zeros((_SUB, _LANES), jnp.float32),
                 jnp.zeros((_SUB, _LANES), jnp.float32))
        for c in range(C):
            ss = ss_ref[c, :, tb].astype(jnp.int32)
            li = li_ref[c, :, tb].astype(jnp.int32)
            xg = DF(_gather_stacked(sh, ss, li, F),
                    _gather_stacked(sl, ss, li, F))
            acc = df_fma(acc, DF(vh_ref[c, :, tb], vl_ref[c, :, tb]),
                         xg)
        # sublane reduction 8 -> 1 by compensated pairwise halving
        p, e = acc.hi, acc.lo
        h = _SUB
        while h > 1:
            half = h // 2
            s, e2 = two_sum(p[:half], p[half:h])
            e = e[:half] + e[half:h] + e2
            p = s
            h = half
        yh_ref[tb] = p[0]
        yl_ref[tb] = e[0]


@partial(jax.jit, static_argnames=("F", "interpret"))
def _k3_df(zh, zl, k3_sub, k3_lane, k3_vals, F: int, interpret=False):
    # tables arrive kernel-ready [C, 8, NR, 128] (see _k3)
    C, _, NR, _ = k3_vals.hi.shape
    TB = _tb_rows(NR)
    tile = lambda: pl.BlockSpec((C, _SUB, TB, _LANES),  # noqa: E731
                                lambda s: (0, 0, s, 0),
                                memory_space=pltpu.VMEM)
    zspec = lambda: pl.BlockSpec((TB * _SUB * F, _LANES),  # noqa: E731
                                 lambda s: (s, 0),
                                 memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        partial(_k3_df_kernel, C=C, F=F, TB=TB),
        grid=(NR // TB,),
        in_specs=[zspec(), zspec(), tile(), tile(), tile(), tile()],
        out_specs=(pl.BlockSpec((TB, _LANES), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TB, _LANES), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NR, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((NR, _LANES), jnp.float32)),
        interpret=interpret,
    )(zh, zl, k3_sub, k3_lane, k3_vals.hi, k3_vals.lo)
    return yh.reshape(NR * _LANES), yl.reshape(NR * _LANES)


def _route_part(bf, x2d, interpret):
    """K1 -> T1 -> K2 -> T2 for one f32 stream (exact movement)."""
    P = bf.P
    u1 = _k1(bf.k1_src, bf.k1_sub, bf.k1_lane, x2d,
             interpret=interpret)
    mid = u1.reshape(P, _B).T.reshape(P, _SUB, _LANES)
    z1 = _k2(mid, bf.k2_sub, bf.k2_lane, interpret=interpret)
    return z1.reshape(P, _B).T.reshape(P * _SUB, _LANES)


@partial(jax.jit, static_argnames=("interpret",))
def _pipeline_df(bf: ButterflyMatrix, x, interpret=False):
    from mpi_bicgstab_tpu.ops.precision import DF, df_add
    n_pad = bf.n_pad
    NR = n_pad // _LANES

    def padp(a):
        return jnp.zeros((bf.nc_pad,), jnp.float32).at[: bf.n_cols].set(
            a[: bf.n_cols])

    NCR = bf.nc_pad // _LANES
    xh, xl = padp(x.hi), padp(x.lo)
    zh = _route_part(bf, xh.reshape(NCR, _LANES), interpret)
    zl = _route_part(bf, xl.reshape(NCR, _LANES), interpret)
    yh, yl = _k3_df(zh, zl, bf.k3_sub, bf.k3_lane, bf.k3_vals,
                    F=bf.stack, interpret=interpret)
    y = DF(yh, yl)
    if bf.tail_n:
        # LEVELED tail: each [cap] level holds at most one entry per
        # row, so per-level scatter + compensated df add keeps the low
        # parts (a flat f32 segment_sum would destroy them — the
        # windowed-ELL lesson, ops/window_ell.py)
        xdf = DF(xh, xl)
        L = bf.tail_rows.shape[0]
        for level in range(L):
            rows = bf.tail_rows[level]
            cols = bf.tail_cols[level]
            tv = DF(bf.tail_vals.hi[level], bf.tail_vals.lo[level])
            prod = tv * DF(xdf.hi[cols], xdf.lo[cols])
            lh = jnp.zeros((n_pad,), jnp.float32).at[rows].add(prod.hi)
            ll = jnp.zeros((n_pad,), jnp.float32).at[rows].add(prod.lo)
            y = df_add(y, DF(lh, ll))
    return y


def butterfly_spmv_df(bf: ButterflyMatrix, x, interpret: bool = False):
    """y = A @ x over the butterfly-routed layout in df32 (DF x, DF
    values). Returns a DF [n_pad] pair; callers slice [: n_rows]."""
    return _pipeline_df(bf, x, interpret=interpret)
