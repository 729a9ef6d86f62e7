"""Fused CA-BiCGStab iteration kernels (f32, DIA operators).

Completes the fused classic family (bicgstab: pallas_fused_classic,
pipe: pallas_fused_pipe): the communication-avoiding rearrangement
(reference solver.c:160-278) runs as exactly TWO Pallas passes per
iteration with its TWO reduction points between them — the lowest
kernel-launch and rendezvous count of any method here:

  K1:  p' = r + beta (p - omega s)       (center tiles)
       s' = w + beta (s - omega z)       (computed in-window)
       z' = A s'                         (DIA core over the s' window)
       q  = r - alpha s'
       y  = w - alpha z'
       partials (q, y), (y, y)
  K2:  r' = q - omega y                  (computed in-window)
       w' = A r'                         (DIA core)
       x' = x + alpha p' + omega q       (center tiles)
       partials (r',r'), (r#,r'), (r#,w'), (r#,s'), (r#,z')

Window streaming as in ops/pallas_fused_classic.py (chunk-head DMA of
the band-halo windows; halo rows recompute redundantly but
identically). Scope: f32 pure-DIA square operators, single device;
api._solve_jit dispatches for method='ca_bicgstab' when `available()`
holds and MBT_FUSED_CA is not '0'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_classic import (_chunk_tiles,
                                                       _dots_spec,
                                                       _load_windows,
                                                       _pad_rows,
                                                       _tile_spec)
from mpi_bicgstab_tpu.ops.pallas_fused_pipe import _dia_core, _dot_row
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_SUB = 8
_TR = 64
_SLACK = 8


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
    win_b = 6 * wr * _LANES * 4                    # 5 sources + result
    vals_b = 2 * A.n_diags * _TR * _LANES * 4
    stream_b = 2 * 12 * _TR * _LANES * 4
    return win_b + vals_b + stream_b <= 13 * 1024 * 1024


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CA", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype)


def _k1_kernel(sc_ref, rp, pp, sp, wp, zp, vals_ref,
               p2_ref, s2_ref, z2_ref, q_ref, y_ref, dots_ref,
               rw, pw, sw, ww, zw, nw, s1, s2_, s3, s4, s5,
               *, offsets, plr, CH, tr):
    i = pl.program_id(0)
    alpha, beta, omega = sc_ref[0], sc_ref[1], sc_ref[2]
    _load_windows(i, CH, tr, (rp, pp, sp, wp, zp),
                  (rw, pw, sw, ww, zw), (s1, s2_, s3, s4, s5))

    @pl.when(i % CH == 0)
    def _():
        # solver.c:220-222 — s' is the SpMV input, so it is formed over
        # the whole window
        nw[...] = ww[...] + beta * (sw[...] - omega * zw[...])

    base = (i % CH) * tr
    z2 = _dia_core(nw, base, tr, plr, offsets, vals_ref)  # solver.c:224
    ctr = pl.ds(base + plr, tr)
    r = rw[ctr, :]
    w = ww[ctr, :]
    s2t = nw[ctr, :]
    p2 = r + beta * (pw[ctr, :] - omega * sw[ctr, :])     # solver.c:217-219
    q = r - alpha * s2t                                   # solver.c:225
    y = w - alpha * z2                                    # solver.c:226
    p2_ref[...] = p2
    s2_ref[...] = s2t
    z2_ref[...] = z2
    q_ref[...] = q
    y_ref[...] = y
    dots_ref[...] = _dot_row([jnp.sum(q * y), jnp.sum(y * y)])


def _k2_kernel(sc_ref, qp, yp, vals_ref, x_ref, p2_ref, rh_ref,
               s2_ref, z2_ref,
               x2_ref, r2_ref, w2_ref, dots_ref,
               qw, yw, nw, s1, s2_,
               *, offsets, plr, CH, tr):
    i = pl.program_id(0)
    alpha, omega = sc_ref[0], sc_ref[1]
    _load_windows(i, CH, tr, (qp, yp), (qw, yw), (s1, s2_))

    @pl.when(i % CH == 0)
    def _():
        nw[...] = qw[...] - omega * yw[...]               # solver.c:235

    base = (i % CH) * tr
    w2 = _dia_core(nw, base, tr, plr, offsets, vals_ref)  # solver.c:238
    ctr = pl.ds(base + plr, tr)
    q = qw[ctr, :]
    r2 = nw[ctr, :]
    x2 = x_ref[...] + alpha * p2_ref[...] + omega * q     # solver.c:233-234
    rh = rh_ref[...]
    x2_ref[...] = x2
    r2_ref[...] = r2
    w2_ref[...] = w2
    dots_ref[...] = _dot_row([
        jnp.sum(r2 * r2), jnp.sum(rh * r2), jnp.sum(rh * w2),
        jnp.sum(rh * s2_ref[...]), jnp.sum(rh * z2_ref[...])])


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_ca_k1(vals, r, p, s, w, z, scalars, offsets: tuple,
                interpret: bool = False, halos=None):
    """scalars = [alpha, beta, omega]. Returns (p2, s2, z2, q, y,
    qTy, yTy).

    halos: optional (r_lo, r_hi, p_lo, p_hi, s_lo, s_hi, w_lo, w_hi,
    z_lo, z_hi) neighbor band-edge values for the distributed
    halo-fused path (ops/pallas_fused_classic._pad_rows); the dots are
    then LOCAL partials to psum."""
    n = r.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 5
                + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)])
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 5 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 6
        + [pltpu.SemaphoreType.DMA(())] * 5,
        interpret=interpret,
    )(scalars,
      _pad_rows(r, plr, phr, *(halos[0:2] if halos else (None, None))),
      _pad_rows(p, plr, phr, *(halos[2:4] if halos else (None, None))),
      _pad_rows(s, plr, phr, *(halos[4:6] if halos else (None, None))),
      _pad_rows(w, plr, phr, *(halos[6:8] if halos else (None, None))),
      _pad_rows(z, plr, phr, *(halos[8:10] if halos else (None, None))),
      vals.reshape(W, nr, _LANES))
    p2, s2, z2, q, y, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    f = lambda a: a.reshape(n)  # noqa: E731
    return f(p2), f(s2), f(z2), f(q), f(y), dsum[0], dsum[1]


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_ca_k2(vals, q, y, x, p2, r_hat, s2, z2, scalars,
                offsets: tuple, interpret: bool = False, halos=None):
    """scalars = [alpha, omega]. Returns (x2, r2, w2, dot_r, rTr,
    rhTw, rhTs, rhTz).

    halos: optional (q_lo, q_hi, y_lo, y_hi) for the distributed
    halo-fused path; the dots are then LOCAL partials to psum."""
    n = q.shape[0]
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    CH = _chunk_tiles(G)
    plr, phr = _halo_rows(offsets)
    wr = CH * tr + plr + phr + _SLACK
    W = len(offsets)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 2
                + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]
                + [_tile_spec(tr)] * 5)
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([_tile_spec(tr)] * 3 + [_dots_spec()]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA(())] * 2,
        interpret=interpret,
    )(scalars,
      _pad_rows(q, plr, phr, *(halos[0:2] if halos else (None, None))),
      _pad_rows(y, plr, phr, *(halos[2:4] if halos else (None, None))),
      vals.reshape(W, nr, _LANES), x.reshape(nr, _LANES),
      p2.reshape(nr, _LANES), r_hat.reshape(nr, _LANES),
      s2.reshape(nr, _LANES), z2.reshape(nr, _LANES))
    x2, r2, w2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    f = lambda a: a.reshape(n)  # noqa: E731
    return (f(x2), f(r2), f(w2), dsum[0], dsum[1], dsum[2], dsum[3],
            dsum[4])


def ca_bicgstab_fused(A: DiaMatrix, b, x0, cfg, interpret=False):
    """CA-BiCGStab with both SpMV-anchored halves fused (single device,
    f32). Mathematically the reference ca_bicgstab (solver.c:160-278)
    with identical update order; pads internally to the tile grid
    (zero rows are inert)."""
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

    r0 = b - dia_spmv(Ap, x0)               # solver.c:200-201
    r_hat = r0                              # solver.c:202
    w0 = dia_spmv(Ap, r0)                   # solver.c:205
    rTr0 = jnp.sum(r0 * r0)
    rTw0 = jnp.sum(r0 * w0)                 # solver.c:203-208
    alpha0 = rTr0 / rTw0                    # solver.c:210
    dot_zero = rTr0
    zero = jnp.asarray(0.0, dtype)
    zv = jnp.zeros_like(b)
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        (k, x, r, w, p, s, z, alpha, beta, omega, rTr, dot_r, hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)   # solver.c:216

    def body(c):
        (k, x, r, w, p, s, z, alpha, beta, omega, rTr, dot_r, hist) = c
        p2, s2, z2, q, y, qTy, yTy = fused_ca_k1(
            vals, r, p, s, w, z, jnp.stack([alpha, beta, omega]),
            offsets, interpret=interpret)
        omega2 = qTy / yTy                              # solver.c:232
        x2, r2, w2, dot_new, rTr_new, rhTw, rhTs, rhTz = fused_ca_k2(
            vals, q, y, x, p2, r_hat, s2, z2,
            jnp.stack([alpha, omega2]), offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)      # solver.c:248
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, p2, s2, z2, alpha2, beta2, omega2,
                rTr_new, dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, zv, zv, zv, alpha0, zero, zero,
        rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[11], out[12]
    relres = jnp.sqrt(dot_r / dot_zero)
    # true-residual gate on `converged` (solvers/base.SolveResult doc)
    r_true = b - dia_spmv(Ap, x)
    true_relres = jnp.sqrt(jnp.sum(r_true * r_true) / dot_zero)
    return SolveResult(x=x[:n0], n_iter=k, final_relres=relres,
                       history=jnp.sqrt(hist / dot_zero),
                       converged=(dot_r <= dot_zero * tol2)
                       & (true_relres <= 100.0 * jnp.sqrt(tol2)),
                       true_relres=true_relres)
