"""Distributed HALO-FUSED classic / CA BiCGStab (f32, DIA partitions).

Round-3 VERDICT weak #6: the fused f32 whole-iteration kernels
(ops/pallas_fused_classic.py, ops/pallas_fused_ca.py — the fastest
single-chip route) dispatched only in the single-device api glue, so a
mesh run forfeited them exactly where the reference's overlap
engineering lives (MPI_csr_spmv_ovlap, matrix.c:428-441).

The enabling observation: those kernels already pad each band-input
vector with `plr`/`phr` zero halo ROWS so out-of-band reads are inert
(ops/pallas_fused_classic._pad_rows). On a 1-D row mesh the same slots
can carry the NEIGHBOR shards' band-edge values instead — two
lax.ppermute edge transfers per kernel call, O(band width) elements,
exactly the reference's halo volume in its P2P variant
(matrix.c:450-492). The kernel's windowed update (e.g. p' = r + beta
(p - omega s), which it forms over the whole window INCLUDING the halo
rows, pallas_fused_classic.py _k1_kernel) then redundantly computes the
few neighbor-owned halo entries from exchanged inputs, so the in-kernel
DIA multiply reads a correct window with NO extra synchronization. Dot
partials are accumulated over local (center) rows only, so a psum over
the rows axis completes them exactly like the XLA path.

Per-iteration communication (classic): 2 edge exchanges + 3 psums —
identical collective count to the unfused distributed loop (the
reference's 2 Iallgatherv + 4 Iallreduce waits, solver.c:86-127), but
every elementwise op and dot partial fused into three Pallas passes.

Dispatch: parallel/driver._go consults `applicable()` per shard-meta;
requires a pure-DIA halo partition, f32, n_loc % 8192 == 0 (the fused
tile grid), and the TPU backend (or MBT_FUSED_DIST=1 for CPU interpret
mode in the mesh tests).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.solvers.base import SolveResult, exact_iters
from mpi_bicgstab_tpu.utils.config import SolverConfig

_LANES = 128
_BLK = 8192          # fused kernels' row-grid block (_TR * _LANES)


def dist_fused_enabled() -> bool:
    """MBT_FUSED_DIST: auto (TPU only) | 1/on (force; CPU = interpret
    mode, used by the 8-device mesh tests) | 0/off."""
    import os

    import jax
    flag = os.environ.get("MBT_FUSED_DIST", "auto").lower()
    if flag in ("0", "off"):
        return False
    if flag in ("1", "on"):
        return True
    return (jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64)


def applicable(part, method: str, b_loc, cfg) -> bool:
    """Gate for the distributed halo-fused dispatch (called inside
    shard_map with the LOCAL rhs shard)."""
    from mpi_bicgstab_tpu.ops.precision import is_df
    if method not in ("bicgstab", "ca_bicgstab", "pipe_bicgstab",
                      "pipe_bicgstab_rr"):
        return False
    if getattr(cfg, "serialize_comm", False):
        return False       # the nooverlap A/B times the XLA path
    if not dist_fused_enabled():
        return False
    if not (part.has_dia and part.dia_mode == "halo"):
        return False
    if part.has_ell or part.has_window or part.has_bfly:
        return False
    if part.n_loc % _BLK != 0:
        return False
    from mpi_bicgstab_tpu.ops.dia import DiaMatrix
    if is_df(b_loc):
        # df32 (round 5): classic only so far — the DF fused kernels
        # (ops/pallas_fused_classic_df) gained halo windows; CA/pipe
        # DF still take the unfused XLA mesh path
        if method != "bicgstab":
            return False
        if b_loc.hi.dtype != jnp.float32:
            return False
        from mpi_bicgstab_tpu.ops import pallas_fused_classic_df
        from mpi_bicgstab_tpu.ops.precision import DF
        shard = DiaMatrix(
            DF(jnp.zeros((len(part.dia_offsets), 0), jnp.float32),
               jnp.zeros((len(part.dia_offsets), 0), jnp.float32)),
            part.dia_offsets, part.n_loc, part.n_loc)
        return pallas_fused_classic_df.format_ok(shard, jnp.float32)
    if b_loc.dtype != jnp.float32:
        return False
    # per-shard VMEM budget check on the LOCAL operator shape
    from mpi_bicgstab_tpu.ops import (pallas_fused_ca,
                                      pallas_fused_classic,
                                      pallas_fused_pipe)
    shard = DiaMatrix(jnp.zeros((len(part.dia_offsets), 0), jnp.float32),
                      part.dia_offsets, part.n_loc, part.n_loc)
    mod = {"bicgstab": pallas_fused_classic,
           "ca_bicgstab": pallas_fused_ca,
           "pipe_bicgstab": pallas_fused_pipe,
           "pipe_bicgstab_rr": pallas_fused_pipe}[method]
    return mod.format_ok(shard, jnp.float32)


def _edges(comm, n_devices: int, plr: int, phr: int, vecs):
    """Band-edge exchange: each shard sends its LAST plr*128 elements
    forward (they are the next shard's low halo) and its FIRST phr*128
    elements backward (the previous shard's high halo). Non-circular —
    edge shards receive zeros, matching the zero vals beyond the matrix
    boundary (same convention as parallel.dist_spmv.spmv_dia_halo)."""
    lo_e, hi_e = plr * _LANES, phr * _LANES
    n_loc = vecs[0].shape[0]
    dt = vecs[0].dtype
    if n_devices <= 1 or comm.axis is None:
        return [(jnp.zeros((lo_e,), dt), jnp.zeros((hi_e,), dt))
                for _ in vecs]
    fwd = [(i, i + 1) for i in range(n_devices - 1)]
    bwd = [(i + 1, i) for i in range(n_devices - 1)]
    los = [jnp.zeros((lo_e,), dt)] * len(vecs)
    his = [jnp.zeros((hi_e,), dt)] * len(vecs)
    if lo_e:
        tails = jnp.stack([v[n_loc - lo_e:] for v in vecs])
        got = lax.ppermute(tails, comm.axis, fwd)
        los = [got[i] for i in range(len(vecs))]
    if hi_e:
        heads = jnp.stack([v[:hi_e] for v in vecs])
        got = lax.ppermute(heads, comm.axis, bwd)
        his = [got[i] for i in range(len(vecs))]
    return list(zip(los, his))


def _flat(pairs):
    out = []
    for lo, hi in pairs:
        out.extend((lo, hi))
    return tuple(out)


def bicgstab_fused_halo(vals_loc, offsets: tuple, comm, n_devices: int,
                        spmv, b, x0, cfg: SolverConfig,
                        interpret: bool = False) -> SolveResult:
    """Classic BiCGStab, three halo-fused Pallas passes per iteration
    per shard (reference solver.c:35-146; single-device twin:
    ops/pallas_fused_classic.bicgstab_fused — the p-update is deferred
    to the next iteration's K1 there too)."""
    from mpi_bicgstab_tpu.ops.pallas_fused_classic import (fused_k1,
                                                           fused_k2,
                                                           fused_k3)
    from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows
    from mpi_bicgstab_tpu.solvers.bicgstab import _finish

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    plr, phr = _halo_rows(offsets)

    r0 = b - spmv(x0)                       # solver.c:74-75
    r_hat = r0                              # solver.c:76
    rTr0 = comm.dot(r0, r0)                 # solver.c:78-80
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
        h = _edges(comm, n_devices, plr, phr, (r, p, s))
        p2, s2, rhTs_l = fused_k1(vals_loc, r, p, s, r_hat,
                                  jnp.stack([beta, omega]), offsets,
                                  interpret=interpret, halos=_flat(h))
        rhTs = comm.allreduce(rhTs_l)               # solver.c:89-91
        alpha = rTr / rhTs                          # solver.c:93
        h2 = _edges(comm, n_devices, plr, phr, (r, s2))
        q, y, qTy_l, yTy_l = fused_k2(vals_loc, r, s2,
                                      jnp.stack([alpha]), offsets,
                                      interpret=interpret,
                                      halos=_flat(h2))
        d2 = comm.allreduce(jnp.stack([qTy_l, yTy_l]))  # solver.c:97-102
        omega2 = d2[0] / d2[1]                      # solver.c:104
        x2, r2, dn_l, rn_l = fused_k3(x, p2, q, y, r_hat,
                                      jnp.stack([alpha, omega2]),
                                      interpret=interpret)
        d3 = comm.allreduce(jnp.stack([dn_l, rn_l]))    # solver.c:108-114
        dot_new, rTr_new = d3[0], d3[1]
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:116
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, p2, s2, beta2, omega2, rTr_new,
                dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, zv, zv, zero, zero, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[8], out[9]
    return _finish(x, k, dot_r, dot_zero, tol2, hist, spmv, comm, b)


def ca_bicgstab_fused_halo(vals_loc, offsets: tuple, comm,
                           n_devices: int, spmv, b, x0,
                           cfg: SolverConfig,
                           interpret: bool = False) -> SolveResult:
    """CA-BiCGStab, two halo-fused Pallas passes per iteration per
    shard (reference solver.c:160-278; single-device twin:
    ops/pallas_fused_ca.ca_bicgstab_fused). Keeps the CA structure's
    two reduction points: (q,y)+(y,y) after K1 and the length-5 batch
    after K2 (solver.c:227-247)."""
    from mpi_bicgstab_tpu.ops.pallas_fused_ca import (fused_ca_k1,
                                                      fused_ca_k2)
    from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows
    from mpi_bicgstab_tpu.solvers.bicgstab import _finish

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    plr, phr = _halo_rows(offsets)

    r0 = b - spmv(x0)                       # solver.c:200-201
    r_hat = r0                              # solver.c:202
    w0 = spmv(r0)                           # solver.c:205
    rTr0, rTw0 = comm.dots((r0, r0), (r0, w0))   # solver.c:203-208
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
        h = _edges(comm, n_devices, plr, phr, (r, p, s, w, z))
        p2, s2, z2, q, y, qTy_l, yTy_l = fused_ca_k1(
            vals_loc, r, p, s, w, z, jnp.stack([alpha, beta, omega]),
            offsets, interpret=interpret, halos=_flat(h))
        d2 = comm.allreduce(jnp.stack([qTy_l, yTy_l]))  # solver.c:227-230
        omega2 = d2[0] / d2[1]                      # solver.c:232
        h2 = _edges(comm, n_devices, plr, phr, (q, y))
        x2, r2, w2, dn_l, rn_l, w_l, s_l, z_l = fused_ca_k2(
            vals_loc, q, y, x, p2, r_hat, s2, z2,
            jnp.stack([alpha, omega2]), offsets, interpret=interpret,
            halos=_flat(h2))
        d5 = comm.allreduce(jnp.stack([dn_l, rn_l, w_l, s_l, z_l]))
        dot_new, rTr_new, rhTw, rhTs, rhTz = (d5[i] for i in range(5))
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:248
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, p2, s2, z2, alpha2, beta2, omega2,
                rTr_new, dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, zv, zv, zv, alpha0, zero, zero,
        rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[11], out[12]
    return _finish(x, k, dot_r, dot_zero, tol2, hist, spmv, comm, b)


def pipe_bicgstab_fused_halo(vals_loc, offsets: tuple, comm,
                             n_devices: int, spmv, b, x0,
                             cfg: SolverConfig, rr: bool = False,
                             interpret: bool = False) -> SolveResult:
    """Pipelined BiCGStab (+ optional residual replacement), two
    halo-fused Pallas phases per iteration per shard — the reference's
    communication-HIDING flagship (solver.c:292-417; RR :433-576),
    distributed (round-4 VERDICT missing #4).

    Unlike classic/CA, both SpMV inputs (z', w') here are recurrence
    results computed BEFORE their phase (solver.c:358-360, 374-375), so
    the halo story is minimal: compute z'/w' locally in XLA, ppermute
    just their band edges, and hand the fused single-device phase
    kernels (ops/pallas_fused_pipe) a pre-filled window. Per-iteration
    communication: 2 edge exchanges + 2 psum batches — one FEWER
    rendezvous than classic (the pipelined rearrangement's point), and
    XLA schedules each psum behind the next phase's kernel exactly as
    the reference hand-places MPI_Wait (solver.c:363-385).

    RR iterations (every cfg.krr, at most cfg.nrr times) re-anchor
    r <- b - A x through the composed distributed `spmv` inside a
    lax.cond, like the unfused loop (solvers/bicgstab.pipe_bicgstab_rr).
    """
    from mpi_bicgstab_tpu.ops.pallas_fused_pipe import (fused_phase_a,
                                                        fused_phase_b)
    from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows
    from mpi_bicgstab_tpu.solvers.bicgstab import _finish

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    plr, phr = _halo_rows(offsets)

    r0 = b - spmv(x0)                       # solver.c:318-319
    r_hat = r0                              # solver.c:320
    w0 = spmv(r0)                           # solver.c:323
    t0 = spmv(w0)                           # solver.c:327
    rTr0, rTw0 = comm.dots((r0, r0), (r0, w0))   # solver.c:321-331
    alpha0 = rTr0 / rTw0                    # solver.c:333
    dot_zero = rTr0
    zero = jnp.asarray(0.0, dtype)
    zv = jnp.zeros_like(b)
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)  # solver.c:351

    def fused_body(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        z2 = t + beta * (z - omega * v)             # solver.c:358-360
        hz, = _edges(comm, n_devices, plr, phr, (z2,))
        v2, p2, s2, q, y, qTy_l, yTy_l = fused_phase_a(
            vals_loc, z2, r, p, s, w, z,
            jnp.stack([alpha, beta, omega]), offsets,
            interpret=interpret, halos=hz)
        d2 = comm.allreduce(jnp.stack([qTy_l, yTy_l]))  # solver.c:363-367
        omega2 = d2[0] / d2[1]                      # solver.c:369
        w2 = y - omega2 * (t - alpha * v2)          # solver.c:374-375
        hw, = _edges(comm, n_devices, plr, phr, (w2,))
        t2, x2, r2, dn_l, rn_l, w_l, s_l, z_l = fused_phase_b(
            vals_loc, w2, x, p2, q, y, r_hat, s2, z2,
            jnp.stack([alpha, omega2]), offsets, interpret=interpret,
            halos=hw)
        d5 = comm.allreduce(jnp.stack([dn_l, rn_l, w_l, s_l, z_l]))
        dot_new, rTr_new, rhTw, rhTs, rhTz = (d5[i] for i in range(5))
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:387
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, t2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    def rr_body(c):
        # residual replacement through the composed distributed spmv
        # (reference solver.c:494-539 — 6 true SpMVs re-anchor every
        # recurrence vector)
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        p2 = r + beta * (p - omega * s)             # solver.c:494-496
        s2 = spmv(p2)                               # solver.c:499
        z2 = spmv(s2)                               # solver.c:500
        q = r - alpha * s2                          # solver.c:510
        y = w - alpha * z2                          # solver.c:511
        qTy, yTy = comm.dots((q, y), (y, y))
        v2 = spmv(z2)                               # solver.c:514
        omega2 = qTy / yTy
        x2 = x + alpha * p2 + omega2 * q            # solver.c:519-520
        r2 = b - spmv(x2)                           # solver.c:523-525
        w2 = spmv(r2)                               # solver.c:526
        dot_new, rTr_new, rhTw, rhTs, rhTz = comm.dots(
            (r2, r2), (r_hat, r2), (r_hat, w2), (r_hat, s2),
            (r_hat, z2))
        t2 = spmv(w2)                               # solver.c:539
        beta2 = (alpha / omega2) * (rTr_new / rTr)
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, t2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    if rr:
        krr, nrr = cfg.krr, cfg.nrr

        def body(c):
            k = c[0]
            is_rr = (k % krr == 0) & (k > 0) & (k <= krr * nrr)
            return lax.cond(is_rr, rr_body, fused_body, c)
    else:
        body = fused_body

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, t0, zv, zv, zv, zv, alpha0, zero,
        zero, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[13], out[14]
    return _finish(x, k, dot_r, dot_zero, tol2, hist, spmv, comm, b)


def _edges_df(comm, n_devices: int, plr: int, phr: int, vecs_df):
    """DF band-edge exchange: _edges on the hi and lo planes, zipped
    back into DF (lo_edge, hi_edge) pairs per vector."""
    from mpi_bicgstab_tpu.ops.precision import DF
    planes = []
    for v in vecs_df:
        planes += [v.hi, v.lo]
    flat = _edges(comm, n_devices, plr, phr, planes)
    out = []
    for i in range(len(vecs_df)):
        (lo_h, hi_h), (lo_l, hi_l) = flat[2 * i], flat[2 * i + 1]
        out.append((DF(lo_h, lo_l), DF(hi_h, hi_l)))
    return out


def bicgstab_fused_df_halo(vals_loc, offsets: tuple, comm,
                           n_devices: int, spmv, b, x0,
                           cfg: SolverConfig,
                           interpret: bool = False) -> SolveResult:
    """df32 classic BiCGStab, three halo-fused DF Pallas passes per
    iteration per shard — f64-class precision at the reference's
    distributed structure (the reference is all-f64 over MPI,
    solver.c:35-146 + matrix.c:428-441). Single-device twin:
    ops/pallas_fused_classic_df.bicgstab_fused_df; halo plumbing as in
    bicgstab_fused_halo with hi/lo planes exchanged pairwise."""
    from mpi_bicgstab_tpu.ops.pallas_fused_classic_df import (
        fused_k1_df, fused_k2_df, fused_k3_df)
    from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows
    from mpi_bicgstab_tpu.ops.precision import DF, df_zeros, vvalue
    from mpi_bicgstab_tpu.solvers.bicgstab import _finish

    tol2 = jnp.asarray(cfg.tol, jnp.float32) ** 2
    max_iter = cfg.max_iter
    plr, phr = _halo_rows(offsets)
    n = b.hi.shape[0]

    r0 = b - spmv(x0)                       # solver.c:74-75
    r_hat = r0                              # solver.c:76
    rTr0 = comm.dot(r0, r0)                 # solver.c:78-80
    dot_zero = rTr0
    zero_s = df_zeros(())
    zv = df_zeros((n,))
    hist0 = jnp.full((max_iter,), jnp.nan, jnp.float32)

    def _red2(a, b2):
        d = comm.allreduce(DF(jnp.stack([a.hi, b2.hi]),
                              jnp.stack([a.lo, b2.lo])))
        return DF(d.hi[0], d.lo[0]), DF(d.hi[1], d.lo[1])

    def cond(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (vvalue(dot_r) > vvalue(dot_zero) * tol2) \
            & (k < max_iter)                            # solver.c:86

    def body(c):
        k, x, r, p, s, beta, omega, rTr, dot_r, hist = c
        h = _edges_df(comm, n_devices, plr, phr, (r, p, s))
        p2, s2, rhTs_l = fused_k1_df(
            vals_loc, r, p, s, r_hat,
            jnp.stack([beta.hi, beta.lo, omega.hi, omega.lo]),
            offsets, interpret=interpret, halos=_flat(h))
        rhTs = comm.allreduce(rhTs_l)               # solver.c:89-91
        alpha = rTr / rhTs                          # solver.c:93
        h2 = _edges_df(comm, n_devices, plr, phr, (r, s2))
        q, y, qTy_l, yTy_l = fused_k2_df(
            vals_loc, r, s2, jnp.stack([alpha.hi, alpha.lo]), offsets,
            interpret=interpret, halos=_flat(h2))
        qTy, yTy = _red2(qTy_l, yTy_l)              # solver.c:97-102
        omega2 = qTy / yTy                          # solver.c:104
        x2, r2, dn_l, rn_l = fused_k3_df(
            x, p2, q, y, r_hat,
            jnp.stack([alpha.hi, alpha.lo, omega2.hi, omega2.lo]),
            interpret=interpret)
        dot_new, rTr_new = _red2(dn_l, rn_l)        # solver.c:108-114
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:116
        hist = hist.at[k].set(vvalue(dot_new))
        return (k + 1, x2, r2, p2, s2, beta2, omega2, rTr_new,
                dot_new, hist)

    out = lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, zv, zv, zero_s, zero_s, rTr0, rTr0,
        hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[8], out[9]
    return _finish(x, k, dot_r, dot_zero, tol2, hist, spmv, comm, b)


def solve_fused_dist(part, mat_args, comm, method: str, spmv, b_loc,
                     x0_loc, cfg: SolverConfig) -> SolveResult:
    """Entry used by parallel.driver._go inside shard_map (after
    `applicable()` said yes): unpack the local DIA slab and run the
    halo-fused loop; `spmv` (the composed distributed SpMV) is used
    only for init, RR re-anchoring, and the exit true-residual check."""
    import jax

    from mpi_bicgstab_tpu.ops.precision import is_df
    dia_vals, _window, _bfly, _blocks, _rest = part.unpack(mat_args)
    interpret = jax.default_backend() == "cpu"
    if is_df(b_loc):
        return bicgstab_fused_df_halo(
            dia_vals, part.dia_offsets, comm, part.n_devices, spmv,
            b_loc, x0_loc, cfg, interpret=interpret)
    if method in ("pipe_bicgstab", "pipe_bicgstab_rr"):
        return pipe_bicgstab_fused_halo(
            dia_vals, part.dia_offsets, comm, part.n_devices, spmv,
            b_loc, x0_loc, cfg, rr=(method == "pipe_bicgstab_rr"),
            interpret=interpret)
    fn = (bicgstab_fused_halo if method == "bicgstab"
          else ca_bicgstab_fused_halo)
    return fn(dia_vals, part.dia_offsets, comm, part.n_devices, spmv,
              b_loc, x0_loc, cfg, interpret=interpret)
