"""Fused classic-BiCGStab iteration kernels (f32, DIA operators).

Round-3 "beyond parity" lever: at Transport scale classic BiCGStab
both converges in FEWER iterations than the pipelined variant (it
re-anchors alpha on a fresh reduction each half-step — e.g. 2,982 vs
4,142 iterations on the 1.6M-row hard regime) and carries FEWER
recurrence vectors (no t/v), so a fused classic iteration is the
fastest single-chip route to a solution. The XLA build materializes
every intermediate between fusions; here each iteration runs exactly
THREE Pallas passes (reference solver.c:86-119 update order):

  K1:  p' = r + beta (p - omega s)     (computed IN-kernel, windows)
       s' = A p'                       (DIA core over the p' window)
       partial (r#, s')
  K2:  q  = r - alpha s'               (computed IN-kernel, windows)
       y  = A q                        (DIA core over the q window)
       partials (q, y), (y, y)
  K3:  x' = x + alpha p' + omega q     (pure streaming pass)
       r' = q - omega y
       partials (r', r'), (r#, r')

Unlike the pipelined phases (ops/pallas_fused_pipe.py) the SpMV input
here is itself a recurrence RESULT, so it cannot be DMA'd in ready-made:
the kernels stream the operand vectors in CHUNKS (the df2 pattern,
ops/pallas_fused_pipe_df2.py) — grid row-tiles are grouped into chunks,
each chunk head DMAs the (chunk + band halo) windows of the source
vectors into VMEM scratch, computes the SpMV input over the WHOLE
window (halo rows recompute redundantly but identically), and the
remaining tiles of the chunk multiply off the resident window.

Scope: f32 pure-DIA square operators (the Transport benchmark shape),
single device; api._solve_jit dispatches when `available()` holds and
MBT_FUSED_CLASSIC is not '0'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_pipe import _dia_core, _dot_row
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_SUB = 8
_TR = 64            # tile rows (sublanes) per grid step
_SLACK = 8          # window over-allocation for the roll's +1 row


def _chunk_tiles(G: int) -> int:
    """Largest divisor of G that is <= 32 (window ~1 MB at tr=64)."""
    for c in range(min(G, 32), 0, -1):
        if G % c == 0:
            return c
    return 1


def format_ok(A, dtype) -> bool:
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not isinstance(A, DiaMatrix) or dtype != jnp.float32:
        return False
    if is_df(A.vals):
        return False
    if A.n_rows != A.n_cols or A.n_diags < 1:
        return False
    n = -(-A.n_rows // (_TR * _LANES)) * (_TR * _LANES)
    G = n // _LANES // _TR
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(A.offsets)
    wr = CH * _TR + plr + phr + _SLACK
    win_b = 4 * wr * _LANES * 4                    # 3 sources + result
    vals_b = 2 * A.n_diags * _TR * _LANES * 4      # double-buffered
    stream_b = 2 * 8 * _TR * _LANES * 4
    return win_b + vals_b + stream_b <= 13 * 1024 * 1024


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CLASSIC", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype)


def _pad_rows(vec, plr: int, phr: int, lo=None, hi=None):
    """[n] -> (plr + nr + phr + slack, 128) window DMA source. The halo
    rows are zeros by default (out-of-band reads inert, single-device
    case); in the DISTRIBUTED halo-fused path they carry the neighbor
    shards' band-edge values (lo = prev shard's last plr*128 elements,
    hi = next shard's first phr*128) so the in-kernel DIA multiply —
    and the redundantly-computed update over the window's halo rows —
    read exactly what the reference's gathered vector supplies
    (matrix.c:432,440)."""
    nr = vec.shape[0] // _LANES
    out = jnp.zeros((plr + nr + phr + _SLACK, _LANES), jnp.float32)
    out = out.at[plr:plr + nr, :].set(vec.reshape(nr, _LANES))
    if lo is not None and plr:
        out = out.at[:plr, :].set(lo.reshape(plr, _LANES))
    if hi is not None and phr:
        out = out.at[plr + nr:plr + nr + phr, :].set(
            hi.reshape(phr, _LANES))
    return out


def _load_windows(i, CH, tr, srcs, wins, sems, row_off=0):
    """At a chunk head, DMA each source's (chunk + halo) window into
    its VMEM scratch; grid steps run sequentially so the scratch
    persists for the chunk's remaining tiles. row_off shifts the
    window start for PADDED-carry sources (data begins at row _TR
    instead of plr — see bicgstab_fused's padded layout)."""
    wr = wins[0].shape[0]

    @pl.when(i % CH == 0)
    def _():
        row0 = (i // CH) * (CH * tr) + row_off
        dmas = [pltpu.make_async_copy(s.at[pl.ds(row0, wr), :], w, sem)
                for s, w, sem in zip(srcs, wins, sems)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


def _k1_kernel(sc_ref, rp, pp, sp, vals_ref, rh_ref,
               p2_ref, s2_ref, dots_ref,
               rw, pw, sw, nw, sem_r, sem_p, sem_s,
               *, offsets, plr, CH, tr, row_off=0):
    """p' = r + beta (p - omega s) over the window; s' = A p'."""
    i = pl.program_id(0)
    beta, omega = sc_ref[0], sc_ref[1]
    _load_windows(i, CH, tr, (rp, pp, sp), (rw, pw, sw),
                  (sem_r, sem_p, sem_s), row_off=row_off)

    @pl.when(i % CH == 0)
    def _():
        # solver.c:117-119 deferred to the start of the next iteration
        # (identical expression, beta=omega=0 on the first one)
        nw[...] = rw[...] + beta * (pw[...] - omega * sw[...])

    base = (i % CH) * tr
    s2 = _dia_core(nw, base, tr, plr, offsets, vals_ref)
    p2_ref[...] = nw[pl.ds(base + plr, tr), :]
    s2_ref[...] = s2
    dots_ref[...] = _dot_row([jnp.sum(rh_ref[...] * s2)])  # solver.c:89-91


def _k2_kernel(sc_ref, rp, sp, vals_ref,
               q_ref, y_ref, dots_ref,
               rw, sw, qw, sem_r, sem_s,
               *, offsets, plr, CH, tr, row_off=0):
    """q = r - alpha s' over the window; y = A q."""
    i = pl.program_id(0)
    alpha = sc_ref[0]
    _load_windows(i, CH, tr, (rp, sp), (rw, sw), (sem_r, sem_s),
                  row_off=row_off)

    @pl.when(i % CH == 0)
    def _():
        qw[...] = rw[...] - alpha * sw[...]         # solver.c:94

    base = (i % CH) * tr
    y = _dia_core(qw, base, tr, plr, offsets, vals_ref)  # solver.c:96
    q = qw[pl.ds(base + plr, tr), :]
    q_ref[...] = q
    y_ref[...] = y
    dots_ref[...] = _dot_row([jnp.sum(q * y), jnp.sum(y * y)])


def _k3_kernel(sc_ref, x_ref, p2_ref, q_ref, y_ref, rh_ref,
               x2_ref, r2_ref, dots_ref):
    """Streaming epilogue: x/r updates + the (r,r),(r#,r) partials."""
    alpha, omega = sc_ref[0], sc_ref[1]
    q = q_ref[...]
    x2 = x_ref[...] + alpha * p2_ref[...] + omega * q    # solver.c:105-106
    r2 = q - omega * y_ref[...]                          # solver.c:107
    x2_ref[...] = x2
    r2_ref[...] = r2
    rh = rh_ref[...]
    dots_ref[...] = _dot_row([jnp.sum(r2 * r2), jnp.sum(rh * r2)])


def _margin_tiles(offsets) -> int:
    """Margin size of the padded-carry layout in row-TILES: the band's
    halo rows must fit inside the margin (plr below, phr + _SLACK
    above). One tile (64 rows) covers the laptop-scale tests; the
    1.6M transport profile's far diagonals reach ~±15k elements = 120
    halo rows -> 2 tiles (the round-5 fix: the hardcoded 1-tile margin
    broke `bicgstab` f32 at the headline scale)."""
    plr, phr = _halo_rows(offsets)
    need = max(plr, phr + _SLACK, 1)
    return -(-need // _TR)


def _tile_spec(tr, shift: int = 0):
    """Tiled (tr, 128) blocks; shift=m places block i at row-tile i+m
    — the data region of a PADDED (m*_TR + nr + m*_TR, 128) array whose
    first/last m row-tiles are the (zero) halo margins."""
    if shift:
        return pl.BlockSpec((tr, _LANES), lambda i, _s=shift: (i + _s, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((tr, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _dots_spec():
    return pl.BlockSpec((1, _SUB, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def pad_carry(vec, nr: int, mt: int = 1):
    """[n] (or (nr,128)) -> (mt*_TR + nr + mt*_TR, 128) PADDED-carry
    layout: mt zero row-TILES of halo margin on each side (tile-aligned
    so kernel out blocks can address the data region directly; mt =
    _margin_tiles(offsets)). The fused loop carries vectors in this
    form across iterations — the per-iteration _pad_rows copies
    (measured 0.29 ms/iter of the 0.71 ms single-chip fused-classic
    iteration, round 4) disappear; fresh kernel outputs get their few
    halo-read margin rows re-zeroed by _zero_margins (a ~KB-scale
    in-place update, not a 51 MB pad pass).

    Aliasing note: K1/K2 outputs must NOT alias their window-DMA'd
    inputs — the chunk-head DMA of chunk c reads source rows that
    overlap the block rows chunk c-1 already wrote (1-row overlap at
    every chunk boundary), so aliasing races the DMA against the
    output copy-out. K3 is purely tiled (block i reads exactly block
    i), where aliasing IS safe and is used."""
    m = mt * _TR
    out = jnp.zeros((m + nr + m, _LANES), jnp.float32)
    return out.at[m:m + nr, :].set(vec.reshape(nr, _LANES))


def _zero_margins(vp, plr: int, phr: int, mt: int = 1):
    """Zero the margin rows a later kernel's window DMA actually reads
    (plr rows below the data, phr + _SLACK above) — fresh pallas
    outputs leave them uninitialized. In-place dynamic updates on the
    loop-carried buffer."""
    m = mt * _TR
    nr = vp.shape[0] - 2 * m
    z_lo = jnp.zeros((plr, _LANES), jnp.float32)
    z_hi = jnp.zeros((phr + _SLACK, _LANES), jnp.float32)
    return vp.at[m - plr:m, :].set(z_lo).at[
        m + nr:m + nr + phr + _SLACK, :].set(z_hi)


@partial(jax.jit, static_argnames=("offsets", "interpret", "padded"))
def fused_k1(vals, r, p, s, r_hat, scalars, offsets: tuple,
             interpret: bool = False, halos=None,
             padded: bool = False):
    """scalars = [beta, omega]. Returns (p2, s2, rhTs).

    halos: optional (r_lo, r_hi, p_lo, p_hi, s_lo, s_hi) neighbor
    band-edge values for the distributed halo-fused path (see
    _pad_rows); rhTs is then the LOCAL partial to psum.

    padded: r/p/s/r_hat arrive in the pad_carry layout
    ((mt*_TR + nr + mt*_TR, 128), zero margins, mt = _margin_tiles) and
    p2/s2 are returned in the SAME layout with the margins preserved
    via input_output_aliases (p and s are donated) — no per-call
    pad/reshape traffic."""
    mt = _margin_tiles(offsets)
    if padded:
        nr = r.shape[0] - 2 * mt * _TR
    else:
        nr = r.shape[0] // _LANES
    n = nr * _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    sh = mt if padded else 0
    rows_out = nr + (2 * mt * _TR if padded else 0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                _tile_spec(tr, sh)]
    if padded:
        srcs = (r, p, s, vals.reshape(W, nr, _LANES), r_hat)
        row_off = mt * _TR - plr
        aliases = {}   # window-DMA'd inputs must not alias (race —
        # see pad_carry); margins re-zeroed below
    else:
        srcs = (
            _pad_rows(r, plr, phr,
                      *(halos[0:2] if halos else (None, None))),
            _pad_rows(p, plr, phr,
                      *(halos[2:4] if halos else (None, None))),
            _pad_rows(s, plr, phr,
                      *(halos[4:6] if halos else (None, None))),
            vals.reshape(W, nr, _LANES),
            r_hat.reshape(nr, _LANES))
        row_off = 0
        aliases = {}
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                row_off=row_off),
        grid=(G,),
        in_specs=in_specs,
        out_specs=(_tile_spec(tr, sh), _tile_spec(tr, sh),
                   _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA(())] * 3,
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, *srcs)
    p2, s2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    if padded:
        return (_zero_margins(p2, plr, phr, mt),
                _zero_margins(s2, plr, phr, mt), dsum[0])
    return p2.reshape(n), s2.reshape(n), dsum[0]


@partial(jax.jit, static_argnames=("offsets", "interpret", "padded"))
def fused_k2(vals, r, s2, scalars, offsets: tuple,
             interpret: bool = False, halos=None,
             padded: bool = False):
    """scalars = [alpha]. Returns (q, y, qTy, yTy).

    halos: optional (r_lo, r_hi, s2_lo, s2_hi) for the distributed
    halo-fused path; the dots are then LOCAL partials to psum.

    padded: pad_carry layout in/out; r is donated to q (r is dead
    after this call in the fused loop) so q inherits the zero margins.
    y's margins are unwritten garbage — it is only ever read on data
    tiles (K3) and never carried."""
    mt = _margin_tiles(offsets)
    if padded:
        nr = r.shape[0] - 2 * mt * _TR
    else:
        nr = r.shape[0] // _LANES
    n = nr * _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    sh = mt if padded else 0
    rows_out = nr + (2 * mt * _TR if padded else 0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)]
    if padded:
        srcs = (r, s2, vals.reshape(W, nr, _LANES))
        row_off = mt * _TR - plr
        aliases = {}   # no aliasing across window DMAs (see pad_carry)
    else:
        srcs = (
            _pad_rows(r, plr, phr,
                      *(halos[0:2] if halos else (None, None))),
            _pad_rows(s2, plr, phr,
                      *(halos[2:4] if halos else (None, None))),
            vals.reshape(W, nr, _LANES))
        row_off = 0
        aliases = {}
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                row_off=row_off),
        grid=(G,),
        in_specs=in_specs,
        out_specs=(_tile_spec(tr, sh), _tile_spec(tr, sh),
                   _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA(())] * 2,
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, *srcs)
    q, y, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    if padded:
        # q's margins stay garbage here: K3 (tiled) aliases q -> r2
        # and r2's margins are re-zeroed there, before any halo read
        return q, y, dsum[0], dsum[1]
    return q.reshape(n), y.reshape(n), dsum[0], dsum[1]


@partial(jax.jit, static_argnames=("interpret", "padded", "mt"))
def fused_k3(x, p2, q, y, r_hat, scalars, interpret: bool = False,
             padded: bool = False, mt: int = 1):
    """scalars = [alpha, omega]. Returns (x2, r2, dot_r, rTr_new).

    padded: pad_carry layout (mt margin tiles, _margin_tiles(offsets));
    x is donated to x2 and q to r2 (both dead after this call), so
    x2/r2 keep the zero margins — r2 is halo-read by the next
    iteration's K1."""
    if padded:
        nr = x.shape[0] - 2 * mt * _TR
    else:
        nr = x.shape[0] // _LANES
    n = nr * _LANES
    tr = _TR
    G = nr // tr
    sh = mt if padded else 0
    rows_out = nr + (2 * mt * _TR if padded else 0)
    if padded:
        srcs = (x, p2, q, y, r_hat)
        aliases = {1: 0, 3: 1}        # x -> x2, q -> r2
    else:
        srcs = (x.reshape(nr, _LANES), p2.reshape(nr, _LANES),
                q.reshape(nr, _LANES), y.reshape(nr, _LANES),
                r_hat.reshape(nr, _LANES))
        aliases = {}
    outs = pl.pallas_call(
        _k3_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_tile_spec(tr, sh)] * 5,
        out_specs=(_tile_spec(tr, sh), _tile_spec(tr, sh),
                   _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows_out, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, *srcs)
    x2, r2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    if padded:
        # r2 is halo-read by the next iteration's K1 — the CALLER
        # re-zeroes its margins (needs the operator's plr/phr); x2's
        # margins are never read
        return x2, r2, dsum[0], dsum[1]
    return x2.reshape(n), r2.reshape(n), dsum[0], dsum[1]


def bicgstab_fused(A: DiaMatrix, b, x0, cfg, interpret=False):
    """Classic BiCGStab, three fused Pallas passes per iteration
    (reference solver.c:35-146 with the end-of-loop p-update deferred
    to the next iteration's K1 — identical expression, beta=omega=0 on
    the first). Pads internally to the 8192-row tile grid (zero rows
    are inert)."""
    from jax import lax

    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult

    n0 = b.shape[0]
    blk = _TR * _LANES
    n = -(-n0 // blk) * blk
    vals = A.vals
    if n != n0:
        vals = jnp.pad(vals, ((0, 0), (0, n - n0)))
        b = jnp.pad(b, (0, n - n0))
        x0 = jnp.pad(x0, (0, n - n0))
    Ap = DiaMatrix(vals, A.offsets, n, n)
    offsets = A.offsets

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter

    r0 = b - dia_spmv(Ap, x0)               # solver.c:74-75
    rTr0 = jnp.sum(r0 * r0)                 # solver.c:78-80
    dot_zero = rTr0
    zero = jnp.asarray(0.0, dtype)
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)
    # PADDED-carry layout (pad_carry): every loop vector lives as a
    # (_TR + nr + _TR, 128) array with zero row-tile margins; kernel
    # aliasing keeps the margins, so the loop pays ZERO pad/reshape
    # traffic per iteration (round-4 device trace: the old per-call
    # _pad_rows + reshape copies cost 0.29 of 0.71 ms/iter here)
    nr = n // _LANES
    plr, phr = _halo_rows(offsets)
    mt = _margin_tiles(offsets)
    r0p = pad_carry(r0, nr, mt)
    r_hat = r0p                             # solver.c:76
    x0p = pad_carry(x0, nr, mt)
    zvp = jnp.zeros_like(r0p)

    def cond(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)   # solver.c:86

    def body(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        p2, s2, rhTs = fused_k1(vals, r, p, s, r_hat,
                                jnp.stack([beta, omega]), offsets,
                                interpret=interpret, padded=True)
        alpha = rTr / rhTs                              # solver.c:93
        q, y, qTy, yTy = fused_k2(vals, r, s2, jnp.stack([alpha]),
                                  offsets, interpret=interpret,
                                  padded=True)
        omega2 = qTy / yTy                              # solver.c:104
        x2, r2, dot_new, rTr_new = fused_k3(
            x, p2, q, y, r_hat, jnp.stack([alpha, omega2]),
            interpret=interpret, padded=True, mt=mt)
        r2 = _zero_margins(r2, plr, phr, mt)   # halo-read by next K1
        beta2 = (alpha / omega2) * (rTr_new / rTr)      # solver.c:116
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, p2, s2, beta2, omega2, rTr_new,
                dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0p, r0p, zvp, zvp, zero, zero, rTr0, rTr0,
        hist0))
    k = out[0]
    x = out[1][mt * _TR:mt * _TR + nr, :].reshape(n)
    dot_r, hist = out[8], out[9]
    relres = jnp.sqrt(dot_r / dot_zero)
    # true-residual gate on `converged` (solvers/base.SolveResult doc)
    r_true = b - dia_spmv(Ap, x)
    true_relres = jnp.sqrt(jnp.sum(r_true * r_true) / dot_zero)
    return SolveResult(x=x[:n0], n_iter=k, final_relres=relres,
                       history=jnp.sqrt(hist / dot_zero),
                       converged=(dot_r <= dot_zero * tol2)
                       & (true_relres <= 100.0 * jnp.sqrt(tol2)),
                       true_relres=true_relres)
