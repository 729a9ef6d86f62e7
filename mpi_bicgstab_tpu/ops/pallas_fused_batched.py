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

Per-lane freezing (vmap's masked-carry semantics, which keeps each
lane's trajectory identical to its standalone solve) happens
IN-REGISTER: the kernels take an active flag per lane and write the
old value back for frozen lanes — no extra jnp.where passes over
[k, n] state (three of those cost ~460 MB/iter at k=8).

Geometry shared with ops/pallas_fused_classic (tr=64 row tiles,
chunked window DMAs, _dia_core lane rolls). Reference: solver.c:35-146
applied per lane; the multi-RHS batch itself is beyond the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_fused_pipe import _dia_core
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_SUB = 8
_TR = 64
_SLACK = 8
_MAX_K = 8


def _chunk_tiles(G: int, k: int, plr: int, phr: int, W: int,
                 n_wins: int) -> int:
    """Largest divisor of G with n_wins batched windows + vals in
    ~13 MB of VMEM."""
    for c in range(min(G, 32), 0, -1):
        if G % c:
            continue
        wr = c * _TR + plr + phr + _SLACK
        win_b = n_wins * k * wr * _LANES * 4
        vals_b = 2 * W * _TR * _LANES * 4
        stream_b = 2 * (4 * k) * _TR * _LANES * 4
        if win_b + vals_b + stream_b <= 13 * 1024 * 1024:
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
    wr = _TR + plr + phr + _SLACK            # CH=1 floor, 4 windows
    win_b = 4 * k * wr * _LANES * 4
    vals_b = 2 * A.n_diags * _TR * _LANES * 4
    return win_b + vals_b + 2 * (4 * k) * _TR * _LANES * 4 \
        <= 13 * 1024 * 1024


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


def _dma_windows(i, CH, tr, srcs, wins, sems):
    """Chunk-head DMA of each [k, R, 128] source's window into its
    [k, wr, 128] scratch."""
    wr = wins[0].shape[1]

    @pl.when(i % CH == 0)
    def _():
        row0 = (i // CH) * (CH * tr)
        dmas = [pltpu.make_async_copy(s.at[:, pl.ds(row0, wr), :], w,
                                      sem)
                for s, w, sem in zip(srcs, wins, sems)]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


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
               rw, pw, sw, nw, sem_r, sem_p, sem_s,
               *, offsets, plr, CH, tr, k):
    """Per lane j: p' = r + beta_j (p - omega_j s) over the window;
    s' = A p'; partial (r#, s'). Frozen lanes (active=0) write p'=p,
    s'=s back (solver.c:117-119 deferred, pallas_fused_classic)."""
    i = pl.program_id(0)
    _dma_windows(i, CH, tr, (rp, pp, sp), (rw, pw, sw),
                 (sem_r, sem_p, sem_s))

    @pl.when(i % CH == 0)
    def _():
        for j in range(k):
            beta, omega = sc_ref[3 * j], sc_ref[3 * j + 1]
            nw[j] = rw[j] + beta * (pw[j] - omega * sw[j])

    base = (i % CH) * tr
    ctr = pl.ds(base + plr, tr)
    parts = []
    for j in range(k):
        a = sc_ref[3 * j + 2]
        s2 = _dia_core(nw.at[j], base, tr, plr, offsets, vals_ref)
        p2 = nw.at[j][ctr, :]
        p2_ref[j] = a * p2 + (1.0 - a) * pw.at[j][ctr, :]
        s2_ref[j] = a * s2 + (1.0 - a) * sw.at[j][ctr, :]
        parts.append([jnp.sum(rh_ref[j] * s2)])
    dots_ref[...] = _dot_rows(parts)


def _k2_kernel(sc_ref, rp, sp, vals_ref,
               q_ref, y_ref, dots_ref,
               rw, sw, qw, sem_r, sem_s,
               *, offsets, plr, CH, tr, k):
    """Per lane j: q = r - alpha_j s' over the window; y = A q;
    partials (q,y), (y,y)."""
    i = pl.program_id(0)
    _dma_windows(i, CH, tr, (rp, sp), (rw, sw), (sem_r, sem_s))

    @pl.when(i % CH == 0)
    def _():
        for j in range(k):
            alpha = sc_ref[2 * j]
            qw[j] = rw[j] - alpha * sw[j]

    base = (i % CH) * tr
    ctr = pl.ds(base + plr, tr)
    parts = []
    for j in range(k):
        y = _dia_core(qw.at[j], base, tr, plr, offsets, vals_ref)
        q = qw.at[j][ctr, :]
        q_ref[j] = q
        y_ref[j] = y
        parts.append([jnp.sum(q * y), jnp.sum(y * y)])
    dots_ref[...] = _dot_rows(parts)


def _k3_kernel(sc_ref, x_ref, p2_ref, q_ref, y_ref, rh_ref,
               x2_ref, r2_ref, dots_ref, *, k):
    """Per lane j: x' = x + alpha_j p' + omega_j q; r' = q - omega_j y;
    partials (r',r'), (r#,r'). Frozen lanes write x'=x, and r' keeps q
    semantics irrelevant — their dots are masked in the solver."""
    parts = []
    for j in range(k):
        alpha, omega, a = (sc_ref[3 * j], sc_ref[3 * j + 1],
                           sc_ref[3 * j + 2])
        q = q_ref[j]
        x2 = x_ref[j] + alpha * p2_ref[j] + omega * q
        r2 = q - omega * y_ref[j]
        x2_ref[j] = a * x2 + (1.0 - a) * x_ref[j]
        r2_ref[j] = a * r2 + (1.0 - a) * q  # placeholder for frozen
        rh = rh_ref[j]
        parts.append([jnp.sum(r2 * r2), jnp.sum(rh * r2)])
    dots_ref[...] = _dot_rows(parts)


def _btile(k, tr):
    return pl.BlockSpec((k, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _dots_spec():
    return pl.BlockSpec((1, _SUB, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _pad3(xs, plr, phr):
    k, n = xs.shape
    nr = n // _LANES
    out = jnp.zeros((k, plr + nr + phr + _SLACK, _LANES), jnp.float32)
    return out.at[:, plr:plr + nr, :].set(xs.reshape(k, nr, _LANES))


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k1b(vals, R, P, S, R_hat, scalars, offsets: tuple,
              interpret: bool = False):
    """scalars = [beta_j, omega_j, active_j] x k. Returns
    (P2, S2, rhTs[k])."""
    k, n = R.shape
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    plr, phr = _halo_rows(offsets)
    W = len(offsets)
    CH = _chunk_tiles(G, k, plr, phr, W, n_wins=4)
    wr = CH * tr + plr + phr + _SLACK
    outs = pl.pallas_call(
        partial(_k1_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                k=k),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM),
           _btile(k, tr)],
        out_specs=(_btile(k, tr), _btile(k, tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((k, wr, _LANES), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA(())] * 3,
        interpret=interpret,
    )(scalars, _pad3(R, plr, phr), _pad3(P, plr, phr),
      _pad3(S, plr, phr), vals.reshape(W, nr, _LANES),
      R_hat.reshape(k, nr, _LANES))
    P2, S2, dots = outs
    d = dots.sum(axis=0)                     # [8, 128]
    return (P2.reshape(k, n), S2.reshape(k, n), d[:k, 0])


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def fused_k2b(vals, R, S2, scalars, offsets: tuple,
              interpret: bool = False):
    """scalars = [alpha_j, 0] x k. Returns (Q, Y, qTy[k], yTy[k])."""
    k, n = R.shape
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    plr, phr = _halo_rows(offsets)
    W = len(offsets)
    CH = _chunk_tiles(G, k, plr, phr, W, n_wins=3)
    wr = CH * tr + plr + phr + _SLACK
    outs = pl.pallas_call(
        partial(_k2_kernel, offsets=offsets, plr=plr, CH=CH, tr=tr,
                k=k),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(_btile(k, tr), _btile(k, tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((k, wr, _LANES), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA(())] * 2,
        interpret=interpret,
    )(scalars, _pad3(R, plr, phr), _pad3(S2, plr, phr),
      vals.reshape(W, nr, _LANES))
    Q, Y, dots = outs
    d = dots.sum(axis=0)
    return Q.reshape(k, n), Y.reshape(k, n), d[:k, 0], d[:k, 1]


@partial(jax.jit, static_argnames=("interpret",))
def fused_k3b(X, P2, Q, Y, R_hat, scalars, interpret: bool = False):
    """scalars = [alpha_j, omega_j, active_j] x k. Returns
    (X2, R2, dot_r[k], rTr[k])."""
    k, n = X.shape
    nr = n // _LANES
    tr = _TR
    G = nr // tr
    outs = pl.pallas_call(
        partial(_k3_kernel, k=k),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_btile(k, tr)] * 5,
        out_specs=(_btile(k, tr), _btile(k, tr), _dots_spec()),
        out_shape=(jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((k, nr, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)),
        interpret=interpret,
    )(scalars, X.reshape(k, nr, _LANES), P2.reshape(k, nr, _LANES),
      Q.reshape(k, nr, _LANES), Y.reshape(k, nr, _LANES),
      R_hat.reshape(k, nr, _LANES))
    X2, R2, dots = outs
    d = dots.sum(axis=0)
    return X2.reshape(k, n), R2.reshape(k, n), d[:k, 0], d[:k, 1]
