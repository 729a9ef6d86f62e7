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


def _load_windows(i, CH, tr, srcs, wins, sems):
    """At a chunk head, DMA each source's (chunk + halo) window into
    its VMEM scratch; grid steps run sequentially so the scratch
    persists for the chunk's remaining tiles."""
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


def _k1_kernel(sc_ref, rp, pp, sp, vals_ref, rh_ref,
               p2_ref, s2_ref, dots_ref,
               rw, pw, sw, nw, sem_r, sem_p, sem_s,
               *, offsets, plr, CH, tr):
    """p' = r + beta (p - omega s) over the window; s' = A p'."""
    i = pl.program_id(0)
    beta, omega = sc_ref[0], sc_ref[1]
    _load_windows(i, CH, tr, (rp, pp, sp), (rw, pw, sw),
                  (sem_r, sem_p, sem_s))

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
               *, offsets, plr, CH, tr):
    """q = r - alpha s' over the window; y = A q."""
    i = pl.program_id(0)
    alpha = sc_ref[0]
    _load_windows(i, CH, tr, (rp, sp), (rw, sw), (sem_r, sem_s))

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


def _tile_spec(tr):
    return pl.BlockSpec((tr, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _dots_spec():
    return pl.BlockSpec((1, _SUB, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k1(vals, r, p, s, r_hat, scalars, offsets: tuple,
             interpret: bool = False, halos=None):
    """scalars = [beta, omega]. Returns (p2, s2, rhTs).

    halos: optional (r_lo, r_hi, p_lo, p_hi, s_lo, s_hi) neighbor
    band-edge values for the distributed halo-fused path (see
    _pad_rows); rhTs is then the LOCAL partial to psum."""
    n = r.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                _tile_spec(tr)]
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=(_tile_spec(tr), _tile_spec(tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA(())] * 3,
        interpret=interpret,
    )(scalars,
      _pad_rows(r, plr, phr, *(halos[0:2] if halos else (None, None))),
      _pad_rows(p, plr, phr, *(halos[2:4] if halos else (None, None))),
      _pad_rows(s, plr, phr, *(halos[4:6] if halos else (None, None))),
      vals.reshape(W, nr, _LANES),
      r_hat.reshape(nr, _LANES))
    p2, s2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    return p2.reshape(n), s2.reshape(n), dsum[0]


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k2(vals, r, s2, scalars, offsets: tuple,
             interpret: bool = False, halos=None):
    """scalars = [alpha]. Returns (q, y, qTy, yTy).

    halos: optional (r_lo, r_hi, s2_lo, s2_hi) for the distributed
    halo-fused path; the dots are then LOCAL partials to psum."""
    n = r.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=(_tile_spec(tr), _tile_spec(tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA(())] * 2,
        interpret=interpret,
    )(scalars,
      _pad_rows(r, plr, phr, *(halos[0:2] if halos else (None, None))),
      _pad_rows(s2, plr, phr, *(halos[2:4] if halos else (None, None))),
      vals.reshape(W, nr, _LANES))
    q, y, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    return q.reshape(n), y.reshape(n), dsum[0], dsum[1]


@partial(jax.jit, static_argnames=("interpret",))
def fused_k3(x, p2, q, y, r_hat, scalars, interpret: bool = False):
    """scalars = [alpha, omega]. Returns (x2, r2, dot_r, rTr_new)."""
    n = x.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    outs = pl.pallas_call(
        _k3_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_tile_spec(tr)] * 5,
        out_specs=(_tile_spec(tr), _tile_spec(tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        interpret=interpret,
    )(scalars, x.reshape(nr, _LANES), p2.reshape(nr, _LANES),
      q.reshape(nr, _LANES), y.reshape(nr, _LANES),
      r_hat.reshape(nr, _LANES))
    x2, r2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
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
    r_hat = r0                              # solver.c:76
    rTr0 = jnp.sum(r0 * r0)                 # solver.c:78-80
    dot_zero = rTr0
    zero = jnp.asarray(0.0, dtype)
    zv = jnp.zeros_like(b)
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)   # solver.c:86

    def body(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        p2, s2, rhTs = fused_k1(vals, r, p, s, r_hat,
                                jnp.stack([beta, omega]), offsets,
                                interpret=interpret)
        alpha = rTr / rhTs                              # solver.c:93
        q, y, qTy, yTy = fused_k2(vals, r, s2, jnp.stack([alpha]),
                                  offsets, interpret=interpret)
        omega2 = qTy / yTy                              # solver.c:104
        x2, r2, dot_new, rTr_new = fused_k3(
            x, p2, q, y, r_hat, jnp.stack([alpha, omega2]),
            interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)      # solver.c:116
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, p2, s2, beta2, omega2, rTr_new,
                dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, zv, zv, zero, zero, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
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
