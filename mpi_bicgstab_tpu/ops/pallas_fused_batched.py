"""Batched classic BiCGStab with FUSED iteration phases: the
pallas_fused_classic three-kernel structure generalized over a k-lane
RHS batch, band values streamed ONCE per phase for the whole batch.

Why a third batched build (after vmap -> pallas_batched_spmv):
measured on the chip at Transport scale, vmap(bicgstab) ran 8 RHS at
4.28 ms/iter (vals re-read per lane), swapping just the SpMV for the
vals-amortized batched kernel reached 2.79 ms (per-RHS speedup 1.99x),
and the remaining gap is the XLA BLAS-1/dot body: ~15 passes over
[8, n] planes per iteration. Here each phase is ONE kernel over all
lanes — the same windows that feed the in-kernel DIA multiply also
produce the updates and dot partials, so every vector plane is read
once per phase.

Round 5: the phases run on a PADDED CARRY, exactly like the
single-lane fused build (ops/pallas_fused_classic.pad_carry): R/P/S
live as [k, m + nr + m, 128] arrays with mt = _margin_tiles zero
row-tiles of halo margin, carried across iterations. The old
per-call `_pad3` re-padded five [k, n] planes per iteration — a
device trace showed ~1.7 ms/iter of XLA pad/copy ops riding along
with 2.4 ms of kernels (scripts/r5_batched_trace.py). Two more wins
from the same trace: the p'/q windows are built IN PLACE in the r
window's scratch (one fewer [k, wr, 128] VMEM window per phase), and
the VMEM budget reflects the measured ~128 MB v5e VMEM instead of the
16 MB/core folklore — bigger chunks, so the window-halo DMA overhead
amortizes (wr = CH*64 + band; at CH=4 the band was ~97% overhead).
Window DMAs stay chunk-head blocking: see _k1_kernel's docstring for
why the double-buffered variant was backed out.

Per-lane freezing (vmap's masked-carry semantics, which keeps each
lane's trajectory identical to its standalone solve) happens
IN-REGISTER: the kernels take an active flag per lane and write the
old value back for frozen lanes — no extra jnp.where passes over
[k, n] state (three of those cost ~460 MB/iter at k=8).

Geometry shared with ops/pallas_fused_classic (tr=64 row tiles,
chunked window DMAs, _dia_core lane rolls, _margin_tiles margins).
Reference: solver.c:35-146 applied per lane; the multi-RHS batch
itself is beyond the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_classic import _margin_tiles
from mpi_bicgstab_tpu.ops.pallas_fused_pipe import _dia_core
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_SUB = 8
_TR = 64
_SLACK = 8
_MAX_K = 8

# VMEM budget for the window scratches: v5e exposes ~128 MB of VMEM
# (probed empirically round 5 — a 120 MB scratch compiles and runs);
# leave half for the double-buffered streams/vals and Mosaic overhead.
# XLA's default SCOPED vmem limit is only 16 MB, so the kernels pass
# vmem_limit_bytes explicitly (_params below).
_VMEM_BUDGET = 64 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)


def _chunk_tiles(G: int, k: int, plr: int, phr: int, W: int,
                 n_wins: int) -> int:
    """Largest divisor of G whose n_wins batched windows + vals +
    streams fit the VMEM budget. Bigger chunks amortize the
    (plr + phr + _SLACK)-row halo each window DMA re-reads.

    MBT_BATCHED_CH forces a chunk size (test hook: laptop-scale
    problems always get CH == G, which would leave the multi-chunk
    stash path of _k1_kernel uncovered by the CPU contract tests)."""
    import os
    forced = os.environ.get("MBT_BATCHED_CH")
    if forced:
        return min(int(forced), G)
    for c in range(min(G, 32), 0, -1):
        if G % c:
            continue
        wr = c * _TR + plr + phr + _SLACK
        win_b = n_wins * k * wr * _LANES * 4
        vals_b = 2 * W * _TR * _LANES * 4
        stream_b = 2 * (4 * k) * _TR * _LANES * 4
        if win_b + vals_b + stream_b <= _VMEM_BUDGET:
            return c
    return 1


def format_ok(A, dtype, k: int) -> bool:
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not isinstance(A, DiaMatrix) or dtype != jnp.float32:
        return False
    if is_df(A.vals) or A.n_rows != A.n_cols or A.n_diags < 1:
        return False
    if not (1 <= k <= _MAX_K):
        return False
    plr, phr = _halo_rows(A.offsets)
    wr = _TR + plr + phr + _SLACK            # CH=1 floor, 3 windows
    win_b = 3 * k * wr * _LANES * 4
    vals_b = 2 * A.n_diags * _TR * _LANES * 4
    return win_b + vals_b + 2 * (4 * k) * _TR * _LANES * 4 \
        <= _VMEM_BUDGET


def available(A, dtype, k: int) -> bool:
    """auto: TPU only; MBT_FUSED_BATCHED=1 forces (CPU = interpret
    mode, for the contract tests); =0 disables."""
    import os
    flag = os.environ.get("MBT_FUSED_BATCHED", "auto").lower()
    if flag in ("0", "off"):
        return False
    if flag not in ("1", "on"):
        if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
            return False
    return format_ok(A, dtype, k)


def pad_carry_b(Xs, nr: int, mt: int):
    """[k, n] -> [k, mt*_TR + nr + mt*_TR, 128] padded-carry layout
    (zero tile-aligned halo margins; the batched analogue of
    pallas_fused_classic.pad_carry). Built ONCE before the loop."""
    k = Xs.shape[0]
    m = mt * _TR
    out = jnp.zeros((k, m + nr + m, _LANES), jnp.float32)
    return out.at[:, m:m + nr, :].set(Xs.reshape(k, nr, _LANES))


def unpad_carry_b(Xp, nr: int, mt: int):
    m = mt * _TR
    k = Xp.shape[0]
    return Xp[:, m:m + nr, :].reshape(k, nr * _LANES)


def _zero_margins_b(vp, plr: int, phr: int, mt: int):
    """Zero the margin rows a later kernel's window DMA actually reads
    (plr below the data, phr + _SLACK above) — fresh pallas outputs
    leave them uninitialized. KB-scale in-place dynamic updates on the
    loop-carried buffer, not a [k, n] pad pass."""
    m = mt * _TR
    k, rows = vp.shape[0], vp.shape[1]
    nr = rows - 2 * m
    z_lo = jnp.zeros((k, plr, _LANES), jnp.float32)
    z_hi = jnp.zeros((k, phr + _SLACK, _LANES), jnp.float32)
    return vp.at[:, m - plr:m, :].set(z_lo).at[
        :, m + nr:m + nr + phr + _SLACK, :].set(z_hi)


def _dot_rows(partials_per_lane):
    """Pack per-lane dot partials into a [1, 8, 128] tile: lane j's
    d-th partial at (sub=j, lane=d)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, _LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, _LANES), 2)
    out = jnp.zeros((1, _SUB, _LANES), jnp.float32)
    for j, parts in enumerate(partials_per_lane):
        for d, v in enumerate(parts):
            out = out + jnp.where((sub == j) & (lane == d), v, 0.0)
    return out


def _k1_kernel(sc_ref, rp, pp, sp, vals_ref, rh_ref,
               p2_ref, s2_ref, dots_ref,
               rw, pw, sw, stp, sts, sem_r, sem_p, sem_s,
               *, offsets, plr, CH, tr, k, row_off, NCH):
    """Per lane j: p' = r + beta_j (p - omega_j s) over the window
    (built IN PLACE in rw — r is not read again this phase);
    s' = A p'; partial (r#, s'). Frozen lanes (active=0) write p'=p,
    s'=s back (solver.c:117-119 deferred, pallas_fused_classic).

    p2/s2 OUTPUTS ALIAS the p/s input buffers (in-place carry: no
    XLA backedge copy of two 52 MB planes per iteration). That makes
    the window DMA racy for the leading plr rows of every chunk after
    the first — earlier chunks already overwrote those data rows in
    HBM — so a persistent VMEM stash (stp/sts) captures each chunk's
    tail-old rows right after window assembly and supplies the next
    chunk's window head instead of the (dirty) HBM rows.

    Window DMAs are chunk-head BLOCKING (single-buffered). A
    double-buffered variant (prefetch chunk c+1 during chunk c's
    compute, cross-step semaphore waits) was built and passed the CPU
    contract tests and a small-scale chip run, but wedged the TPU
    worker at transport scale twice (k=8, wide band) — the blocking
    stall it would remove is ~15% of the phase, not worth the
    reliability risk on this runtime. NCH is kept in the signature for
    that variant's return."""
    del NCH
    i = pl.program_id(0)
    wr = rw.shape[1]

    @pl.when(i == 0)
    def _():
        # chunk 0: full windows — the leading plr rows are the padded
        # carry's zero margin, clean in HBM (margins are never written)
        row0 = row_off
        dmas = [pltpu.make_async_copy(src.at[:, pl.ds(row0, wr), :],
                                      win, sem)
                for src, win, sem in ((rp, rw, sem_r), (pp, pw, sem_p),
                                      (sp, sw, sem_s))]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    @pl.when((i % CH == 0) & (i > 0))
    def _():
        row0 = (i // CH) * (CH * tr) + row_off
        # r's buffer is not aliased this phase: full window
        d_r = pltpu.make_async_copy(rp.at[:, pl.ds(row0, wr), :], rw,
                                    sem_r)
        # p/s: skip the dirty leading plr rows; stash supplies them
        d_p = pltpu.make_async_copy(
            pp.at[:, pl.ds(row0 + plr, wr - plr), :],
            pw.at[:, pl.ds(plr, wr - plr), :], sem_p)
        d_s = pltpu.make_async_copy(
            sp.at[:, pl.ds(row0 + plr, wr - plr), :],
            sw.at[:, pl.ds(plr, wr - plr), :], sem_s)
        for d in (d_r, d_p, d_s):
            d.start()
        for d in (d_r, d_p, d_s):
            d.wait()
        if plr:
            pw[:, 0:plr, :] = stp[...]
            sw[:, 0:plr, :] = sts[...]

    @pl.when(i % CH == 0)
    def _():
        if plr:
            # stash data rows [(c+1)*CH*tr - plr, (c+1)*CH*tr) for the
            # next chunk's window head, BEFORE this chunk's output
            # write-back dirties them in HBM (pw itself stays clean
            # all chunk — p' is built in rw)
            stp[...] = pw[:, pl.ds(CH * tr, plr), :]
            sts[...] = sw[:, pl.ds(CH * tr, plr), :]
        for j in range(k):
            beta, omega = sc_ref[3 * j], sc_ref[3 * j + 1]
            rw[j] = rw[j] + beta * (pw[j] - omega * sw[j])

    base = (i % CH) * tr
    ctr = pl.ds(base + plr, tr)
    parts = []
    for j in range(k):
        a = sc_ref[3 * j + 2]
        s2 = _dia_core(rw.at[j], base, tr, plr, offsets, vals_ref)
        p2 = rw.at[j][ctr, :]
        p2_ref[j] = a * p2 + (1.0 - a) * pw.at[j][ctr, :]
        s2_ref[j] = a * s2 + (1.0 - a) * sw.at[j][ctr, :]
        parts.append([jnp.sum(rh_ref[j] * s2)])
    dots_ref[...] = _dot_rows(parts)


def _k2_kernel(sc_ref, rp, sp, vals_ref,
               q_ref, y_ref, dots_ref,
               rw, sw, sem_r, sem_s,
               *, offsets, plr, CH, tr, k, row_off, NCH):
    """Per lane j: q = r - alpha_j s' over the window (in place in
    rw); y = A q; partials (q,y), (y,y). No stash needed: neither
    window source is aliased to an output of this phase."""
    del NCH
    i = pl.program_id(0)
    wr = rw.shape[1]

    @pl.when(i % CH == 0)
    def _():
        row0 = (i // CH) * (CH * tr) + row_off
        dmas = [pltpu.make_async_copy(src.at[:, pl.ds(row0, wr), :],
                                      win, sem)
                for src, win, sem in ((rp, rw, sem_r), (sp, sw, sem_s))]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()
        for j in range(k):
            alpha = sc_ref[2 * j]
            rw[j] = rw[j] - alpha * sw[j]

    base = (i % CH) * tr
    ctr = pl.ds(base + plr, tr)
    parts = []
    for j in range(k):
        y = _dia_core(rw.at[j], base, tr, plr, offsets, vals_ref)
        q = rw.at[j][ctr, :]
        q_ref[j] = q
        y_ref[j] = y
        parts.append([jnp.sum(q * y), jnp.sum(y * y)])
    dots_ref[...] = _dot_rows(parts)


def _k3_kernel(sc_ref, x_ref, p2_ref, q_ref, y_ref, rh_ref,
               x2_ref, r2_ref, dots_ref, *, k):
    """Per lane j: x' = x + alpha_j p' + omega_j q; r' = q - omega_j y;
    partials (r',r'), (r#,r'). Frozen lanes write x'=x and r'=q, and
    q = r exactly for frozen lanes (k2 ran with alpha=0), so the
    carried residual freezes without any solver-side [k, n] select."""
    parts = []
    for j in range(k):
        alpha, omega, a = (sc_ref[3 * j], sc_ref[3 * j + 1],
                           sc_ref[3 * j + 2])
        q = q_ref[j]
        x2 = x_ref[j] + alpha * p2_ref[j] + omega * q
        r2 = q - omega * y_ref[j]
        x2_ref[j] = a * x2 + (1.0 - a) * x_ref[j]
        r2_ref[j] = a * r2 + (1.0 - a) * q
        rh = rh_ref[j]
        parts.append([jnp.sum(r2 * r2), jnp.sum(rh * r2)])
    dots_ref[...] = _dot_rows(parts)


def _btile(k, tr, shift: int = 0):
    """Tiled (k, tr, 128) blocks; shift=mt addresses the data region
    of a padded-carry array (block row-tile i + mt)."""
    if shift:
        return pl.BlockSpec((k, tr, _LANES),
                            lambda i, _s=shift: (0, i + _s, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((k, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _dots_spec():
    return pl.BlockSpec((1, _SUB, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("offsets", "mt", "interpret"))
def fused_k1b(vals3, Rp, Pp, Sp, Rh3, scalars, offsets: tuple,
              mt: int, interpret: bool = False):
    """scalars = [beta_j, omega_j, active_j] x k. Rp/Pp/Sp arrive in
    the pad_carry_b layout; returns (P2p, S2p, rhTs[k]) with P2p/S2p
    in the SAME layout (margins re-zeroed — no per-call pad traffic).
    vals3 [W, nr, 128] and Rh3 [k, nr, 128] arrive PRE-RESHAPED: under
    TPU tiled layouts these reshapes are physical relayouts, and done
    here they re-materialize inside the while loop every iteration
    (~300 us/iter of the round-5 trace)."""
    k = Rp.shape[0]
    nr = Rp.shape[1] - 2 * mt * _TR
    tr = _TR
    G = nr // tr
    plr, phr = _halo_rows(offsets)
    W = len(offsets)
    assert vals3.shape == (W, nr, _LANES), vals3.shape
    CH = _chunk_tiles(G, k, plr, phr, W, n_wins=3)
    wr = CH * tr + plr + phr + _SLACK
    row_off = mt * _TR - plr
    rows_out = nr + 2 * mt * _TR
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                k=k, row_off=row_off, NCH=G // CH),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM),
           _btile(k, tr)],
        out_specs=(_btile(k, tr, mt), _btile(k, tr, mt), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, rows_out, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((k, rows_out, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((k, wr, _LANES), jnp.float32)] * 3
        + [pltpu.VMEM((k, max(plr, 1), _LANES), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA(())] * 3,
        # in-place carry: p2 <- p, s2 <- s (the stash in _k1_kernel
        # makes the window DMA safe); margins arrive zero in Pp/Sp and
        # are never written, so no _zero_margins_b pass is needed
        input_output_aliases={2: 0, 3: 1},
        compiler_params=_params(),
        interpret=interpret,
    )(scalars, Rp, Pp, Sp, vals3, Rh3)
    P2p, S2p, dots = outs
    d = dots.sum(axis=0)                     # [8, 128]
    return P2p, S2p, d[:k, 0]


@partial(jax.jit, static_argnames=("offsets", "mt", "interpret"))
def fused_k2b(vals3, Rp, S2p, scalars, offsets: tuple, mt: int,
              interpret: bool = False):
    """scalars = [alpha_j, 0] x k. Rp/S2p in pad_carry_b layout;
    vals3 [W, nr, 128] pre-reshaped (see fused_k1b). Returns
    (Q, Y, qTy[k], yTy[k]) — Q/Y unpadded [k, nr, 128]: they are
    consumed only by the purely-tiled K3, and staying 3D avoids a
    relayout round-trip per iteration."""
    k = Rp.shape[0]
    nr = Rp.shape[1] - 2 * mt * _TR
    tr = _TR
    G = nr // tr
    plr, phr = _halo_rows(offsets)
    W = len(offsets)
    CH = _chunk_tiles(G, k, plr, phr, W, n_wins=2)
    wr = CH * tr + plr + phr + _SLACK
    row_off = mt * _TR - plr
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                k=k, row_off=row_off, NCH=G // CH),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(_btile(k, tr), _btile(k, tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((k, wr, _LANES), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA(())] * 2,
        compiler_params=_params(),
        interpret=interpret,
    )(scalars, Rp, S2p, vals3)
    Q, Y, dots = outs
    d = dots.sum(axis=0)
    return Q, Y, d[:k, 0], d[:k, 1]


@partial(jax.jit, static_argnames=("offsets", "mt", "interpret"))
def fused_k3b(X, P2p, Q, Y, Rh3, scalars, offsets: tuple, mt: int,
              interpret: bool = False):
    """scalars = [alpha_j, omega_j, active_j] x k. X/Q/Y/Rh3 arrive
    [k, nr, 128] (3D everywhere inside the loop — 2D<->3D reshapes are
    physical relayouts under TPU tiling); P2p in pad_carry_b layout.
    Returns (X2[k, nr, 128], R2p padded, dot_r[k], rTr[k]) — R2p feeds
    the next iteration's K1 directly. X is DONATED to X2 (purely tiled
    phase: block i reads exactly block i, the aliasing-safe case of
    pallas_fused_classic.pad_carry's note)."""
    k, nr = X.shape[0], X.shape[1]
    tr = _TR
    G = nr // tr
    plr, phr = _halo_rows(offsets)
    rows_out = nr + 2 * mt * _TR
    outs = pl.pallas_call(
        partial(_k3_kernel, k=k),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _btile(k, tr), _btile(k, tr, mt),
                  _btile(k, tr), _btile(k, tr), _btile(k, tr)],
        out_specs=(_btile(k, tr), _btile(k, tr, mt), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((k, rows_out, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scalars, X, P2p, Q, Y, Rh3)
    X2, R2p, dots = outs
    d = dots.sum(axis=0)
    return (X2, _zero_margins_b(R2p, plr, phr, mt),
            d[:k, 0], d[:k, 1])
