"""Fused pipelined-BiCGStab iteration phases (f32, DIA operators).

VERDICT round-1 item #4: the XLA build of pipe_bicgstab materializes
every recurrence vector between fusions, flooring time/iter around
~660-780 us at Transport scale. Each iteration has exactly two
SpMV-anchored phases; this module fuses each phase's vector updates
and dot products INTO the DIA SpMV's tile pass, so the recurrence
vectors stream through VMEM exactly once per phase:

  phase A (solver.c:352-367):  given z' = t + beta (z - omega v)
     per tile:  v' = A z'                       (DIA core)
                p' = r + beta (p - omega s)
                s' = w + beta (s - omega z')
                q  = r - alpha s'
                y  = w - alpha z'
                partials: (q,y), (y,y)
  phase B (solver.c:369-385):  given w' = y - omega (t - alpha v')
     per tile:  t' = A w'                       (DIA core)
                x' = x + alpha p' + omega q
                r' = q - omega y
                partials: (r',r'), (rhat,r'), (rhat,w'), (rhat,s'),
                          (rhat,z')

The SpMV input (z' / w') is DMA'd HBM->VMEM once per call and stays
resident (the ops/pallas_spmv.py pattern), so the off-tile band reads
need no halo logic. Dot partials accumulate per grid step into a
[G, 128] buffer summed by XLA (grid steps run sequentially on the
TensorCore, but per-step slots avoid any accumulation ordering
assumption).

Scope: f32 + pure-DIA operators (the Transport benchmark shape);
solvers/bicgstab.pipe_bicgstab uses it when `available()` says so and
MBT_FUSED_PIPE is not '0'. Falls back to the XLA build otherwise.
Measured on the v5e: see docs/RESULTS_TPU.md (round 2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows, _round_up

_LANES = 128
_SUB = 8


def format_ok(A, dtype) -> bool:
    """Structural/dtype/VMEM gate, backend-independent: pure-DIA f32
    square operators whose resident iterate + vals stream fit VMEM
    (the solver pads internally to the 8192-row grid, so any n
    qualifies)."""
    if not isinstance(A, DiaMatrix) or dtype != jnp.float32:
        return False
    from mpi_bicgstab_tpu.ops.precision import is_df
    if is_df(A.vals):
        return False          # df32 operators route to the _df variant
    n_pad = _round_up(A.n_rows, 8192)
    plr, phr = _halo_rows(A.offsets)
    xp_bytes = (plr + n_pad // _LANES + phr) * _LANES * 4
    vals_bytes = 2 * A.n_diags * 8192 * 4
    stream_bytes = 2 * 13 * 8192 * 4          # in+out tile buffers
    return (A.n_diags >= 1 and A.n_rows == A.n_cols
            and xp_bytes + vals_bytes + stream_bytes
            <= 13 * 1024 * 1024)


def available(A, dtype) -> bool:
    import os
    if os.environ.get("MBT_FUSED_PIPE", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu":
        return False          # compiled-Mosaic path; XLA covers CPU
    if jax.config.jax_enable_x64:
        return False          # Mosaic x64 lane-roll hazard (fence)
    return format_ok(A, dtype)


def _dot_row(vals_list):
    """Pack scalar dot partials into lane slots of a [1,8,128] tile
    WITHOUT scatter (unsupported in Mosaic): masked broadcasts."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, _LANES), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, _LANES), 1)
    d = jnp.zeros((1, _SUB, _LANES), jnp.float32)
    for k, v in enumerate(vals_list):
        d = d + jnp.where((sub == 0) & (lane == k), v, 0.0)
    return d


def _dia_core(xp, rs, tr, plr, offsets, vals_ref):
    """One DIA tile multiply off the resident padded iterate (the
    ops/pallas_spmv.py inner loop, shared shape rules)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANES), 1)
    acc = jnp.zeros((tr, _LANES), vals_ref.dtype)
    for w, o in enumerate(offsets):
        q_, s_ = divmod(o, _LANES)
        if s_ == 0:
            aligned = xp[pl.ds(rs + plr + q_, tr), :]
        else:
            r12 = xp[pl.ds(rs + plr + q_, tr + 1), :]
            rolled = pltpu.roll(r12, np.int32(_LANES - s_), axis=1)
            aligned = jnp.where(lane < _LANES - s_, rolled[:tr],
                                rolled[1:])
        acc = acc + vals_ref[w] * aligned
    return acc


def _phase_a_kernel(sc_ref, zf_hbm, vals_ref, r_ref, p_ref, s_ref, w_ref,
                    z_ref, v2_ref, p2_ref, s2_ref, q_ref, y_ref,
                    dots_ref, xp, sem, *, offsets, plr, nr, tr,
                    haloed=False):
    i = pl.program_id(0)
    alpha, beta, omega = sc_ref[0], sc_ref[1], sc_ref[2]

    @pl.when(i == 0)
    def _():
        if haloed:
            # distributed halo-fused path: zf_hbm arrives as the FULL
            # (plr + nr + phr, 128) window with the margin rows already
            # carrying the neighbor shards' band-edge values
            # (solvers/fused_dist._pad_window) — one whole-window DMA
            dma = pltpu.make_async_copy(zf_hbm, xp, sem)
            dma.start()
            dma.wait()
        else:
            if plr:
                xp[pl.ds(0, plr), :] = jnp.zeros((plr, _LANES), xp.dtype)
            tail = xp.shape[0] - plr - nr
            if tail:
                xp[pl.ds(plr + nr, tail), :] = jnp.zeros((tail, _LANES),
                                                         xp.dtype)
            dma = pltpu.make_async_copy(zf_hbm, xp.at[pl.ds(plr, nr), :],
                                        sem)
            dma.start()
            dma.wait()

    rs = i * tr
    v2 = _dia_core(xp, rs, tr, plr, offsets, vals_ref)
    zt = xp[pl.ds(rs + plr, tr), :]                  # z' tile (updated)
    r = r_ref[...]
    w = w_ref[...]
    p2 = r + beta * (p_ref[...] - omega * s_ref[...])
    # solver.c:355-357 — the s update reads the OLD z (z is only
    # replaced afterwards, :358-360); the resident iterate here is
    # the NEW z', so old z streams in separately
    s2 = w + beta * (s_ref[...] - omega * z_ref[...])
    q = r - alpha * s2
    y = w - alpha * zt
    v2_ref[...] = v2
    p2_ref[...] = p2
    s2_ref[...] = s2
    q_ref[...] = q
    y_ref[...] = y
    dots_ref[...] = _dot_row([jnp.sum(q * y), jnp.sum(y * y)])


def _phase_b_kernel(sc_ref, wf_hbm, vals_ref, x_ref, p2_ref, q_ref,
                    y_ref, rh_ref, s2_ref, z2_ref,
                    t2_ref, x2_ref, r2_ref, dots_ref,
                    xp, sem, *, offsets, plr, nr, tr, haloed=False):
    i = pl.program_id(0)
    alpha, omega = sc_ref[0], sc_ref[1]

    @pl.when(i == 0)
    def _():
        if haloed:
            dma = pltpu.make_async_copy(wf_hbm, xp, sem)
            dma.start()
            dma.wait()
        else:
            if plr:
                xp[pl.ds(0, plr), :] = jnp.zeros((plr, _LANES), xp.dtype)
            tail = xp.shape[0] - plr - nr
            if tail:
                xp[pl.ds(plr + nr, tail), :] = jnp.zeros((tail, _LANES),
                                                         xp.dtype)
            dma = pltpu.make_async_copy(wf_hbm, xp.at[pl.ds(plr, nr), :],
                                        sem)
            dma.start()
            dma.wait()

    rs = i * tr
    t2 = _dia_core(xp, rs, tr, plr, offsets, vals_ref)
    wt = xp[pl.ds(rs + plr, tr), :]                  # w' tile
    q = q_ref[...]
    y = y_ref[...]
    rh = rh_ref[...]
    x2 = x_ref[...] + alpha * p2_ref[...] + omega * q
    r2 = q - omega * y
    t2_ref[...] = t2
    x2_ref[...] = x2
    r2_ref[...] = r2
    dots_ref[...] = _dot_row([jnp.sum(r2 * r2), jnp.sum(rh * r2),
                              jnp.sum(rh * wt),
                              jnp.sum(rh * s2_ref[...]),
                              jnp.sum(rh * z2_ref[...])])


def _specs(nr, tr, W, n_stream):
    tile = lambda: pl.BlockSpec((tr, _LANES), lambda i: (i, 0),  # noqa
                                memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # scalars
        pl.BlockSpec(memory_space=pl.ANY),          # spmv input (HBM)
        pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),      # vals stream
    ] + [tile() for _ in range(n_stream)]
    return in_specs, tile


def _pad_window(vec, plr: int, phr: int, lo, hi):
    """[n] + neighbor band edges -> the full (plr + nr + phr, 128)
    window the kernel DMAs whole (distributed halo-fused path; the
    margin rows carry what the reference's gathered vector supplies
    beyond the local row range, matrix.c:432,440)."""
    nr = vec.shape[0] // _LANES
    out = jnp.zeros((plr + nr + phr, _LANES), vec.dtype)
    out = out.at[plr:plr + nr, :].set(vec.reshape(nr, _LANES))
    if plr:
        out = out.at[:plr, :].set(lo.reshape(plr, _LANES))
    if phr:
        out = out.at[plr + nr:, :].set(hi.reshape(phr, _LANES))
    return out


@partial(jax.jit, static_argnames=("offsets", "block_rows", "interpret"))
def fused_phase_a(vals, z_full, r, p, s, w, z_old, scalars,
                  offsets: tuple, block_rows: int = 8192,
                  interpret: bool = False, halos=None):
    """scalars = [alpha, beta, omega]. Returns (v2, p2, s2, q, y,
    qTy, yTy).

    halos: optional (z_lo, z_hi) neighbor band-edge values of the SpMV
    input for the distributed halo-fused path (solvers/fused_dist);
    the elementwise updates and dot partials are purely local tiles,
    so only the resident iterate window needs them. The dots are then
    LOCAL partials to psum."""
    n = z_full.shape[0]
    W = len(offsets)
    nr = n // _LANES
    tr = block_rows // _LANES
    plr, phr = _halo_rows(offsets)
    G = nr // tr
    in_specs, tile = _specs(nr, tr, W, 5)
    if halos is not None:
        z_in = _pad_window(z_full, plr, phr, *halos)
    else:
        z_in = z_full.reshape(nr, _LANES)
    outs = pl.pallas_call(
        partial(_phase_a_kernel, offsets=offsets, plr=plr, nr=nr, tr=tr,
                haloed=halos is not None),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([tile() for _ in range(5)]
                        + [pl.BlockSpec((1, _SUB, _LANES),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[
            pltpu.VMEM((plr + nr + phr, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scalars, z_in, vals.reshape(W, nr, _LANES),
      r.reshape(nr, _LANES), p.reshape(nr, _LANES),
      s.reshape(nr, _LANES), w.reshape(nr, _LANES),
      z_old.reshape(nr, _LANES))
    v2, p2, s2, q, y, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    flat = lambda a: a.reshape(n)  # noqa: E731
    return (flat(v2), flat(p2), flat(s2), flat(q), flat(y),
            dsum[0], dsum[1])


@partial(jax.jit, static_argnames=("offsets", "block_rows", "interpret"))
def fused_phase_b(vals, w_full, x, p2, q, y, r_hat, s2, z2, scalars,
                  offsets: tuple, block_rows: int = 8192,
                  interpret: bool = False, halos=None):
    """scalars = [alpha, omega]. Returns (t2, x2, r2, dot_r, rTr, rhTw,
    rhTs, rhTz).

    halos: optional (w_lo, w_hi) neighbor band edges of the SpMV input
    (distributed halo-fused path; see fused_phase_a)."""
    n = w_full.shape[0]
    W = len(offsets)
    nr = n // _LANES
    tr = block_rows // _LANES
    plr, phr = _halo_rows(offsets)
    G = nr // tr
    in_specs, tile = _specs(nr, tr, W, 7)
    if halos is not None:
        w_in = _pad_window(w_full, plr, phr, *halos)
    else:
        w_in = w_full.reshape(nr, _LANES)
    outs = pl.pallas_call(
        partial(_phase_b_kernel, offsets=offsets, plr=plr, nr=nr, tr=tr,
                haloed=halos is not None),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple([tile() for _ in range(3)]
                        + [pl.BlockSpec((1, _SUB, _LANES),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nr, _LANES), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((G, _SUB, _LANES), jnp.float32)]),
        scratch_shapes=[
            pltpu.VMEM((plr + nr + phr, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scalars, w_in, vals.reshape(W, nr, _LANES),
      x.reshape(nr, _LANES), p2.reshape(nr, _LANES),
      q.reshape(nr, _LANES), y.reshape(nr, _LANES),
      r_hat.reshape(nr, _LANES), s2.reshape(nr, _LANES),
      z2.reshape(nr, _LANES))
    t2, x2, r2, dots = outs
    dsum = dots[:, 0].sum(axis=0)
    flat = lambda a: a.reshape(n)  # noqa: E731
    return (flat(t2), flat(x2), flat(r2), dsum[0], dsum[1], dsum[2],
            dsum[3], dsum[4])


def pipe_bicgstab_fused(A: DiaMatrix, b, x0, cfg, interpret=False):
    """Pipelined BiCGStab with both phases fused (single device, f32).

    Mathematically the reference pipe_bicgstab (solver.c:292-417) with
    the identical update order; dot partials reduce per 8192-row tile
    (a different summation order than XLA's — same rounding class).
    Vectors are padded to the 8192-row grid internally (padded vals
    are absent -> zero rows, so trajectories match the unpadded ones)."""
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult

    n0 = b.shape[0]
    n = _round_up(n0, 8192)
    offsets = A.offsets
    W = len(offsets)
    vals = A.vals
    if n != n0:
        vals = jnp.pad(vals, ((0, 0), (0, n - n0)))
        b = jnp.pad(b, (0, n - n0))
        x0 = jnp.pad(x0, (0, n - n0))
    Ap = DiaMatrix(vals, offsets, n, n)

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter

    r0 = b - dia_spmv(Ap, x0)
    r_hat = r0
    w0 = dia_spmv(Ap, r0)
    t0 = dia_spmv(Ap, w0)
    rTr0 = jnp.sum(r0 * r0)
    rTw0 = jnp.sum(r0 * w0)
    alpha0 = rTr0 / rTw0
    zero = jnp.asarray(0.0, dtype)
    zv = jnp.zeros_like(b)
    dot_zero = rTr0
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)

    def body(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        z2 = t + beta * (z - omega * v)             # solver.c:358-360
        v2, p2, s2, q, y, qTy, yTy = fused_phase_a(
            vals, z2, r, p, s, w, z,
            jnp.stack([alpha, beta, omega]), offsets,
            interpret=interpret)
        omega2 = qTy / yTy                          # solver.c:369
        w2 = y - omega2 * (t - alpha * v2)          # solver.c:374-375
        t2, x2, r2, dot_new, rTr_new, rhTw, rhTs, rhTz = fused_phase_b(
            vals, w2, x, p2, q, y, r_hat, s2, z2,
            jnp.stack([alpha, omega2]), offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)  # solver.c:387
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, t2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    out = jax.lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, t0, zv, zv, zv, zv, alpha0, zero,
        zero, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[13], out[14]
    relres = jnp.sqrt(dot_r / dot_zero)
    # true-residual gate on `converged` (solvers/base.SolveResult doc):
    # one XLA SpMV at exit, outside the iteration loop
    r_true = b - dia_spmv(Ap, x)
    true_relres = jnp.sqrt(jnp.sum(r_true * r_true) / dot_zero)
    return SolveResult(x=x[:n0], n_iter=k, final_relres=relres,
                       history=jnp.sqrt(hist / dot_zero),
                       converged=(dot_r <= dot_zero * tol2)
                       & (true_relres <= 100.0 * jnp.sqrt(tol2)),
                       true_relres=true_relres)


def pipe_bicgstab_rr_fused(A: DiaMatrix, b, x0, cfg, interpret=False):
    """Pipelined BiCGStab + residual replacement, fused phases on the
    recurrence iterations (reference solver.c:433-576). RR iterations
    are rare (at most cfg.nrr of them, every cfg.krr steps), so the
    body lax.cond-selects between the fused two-kernel iteration and an
    XLA replacement iteration (s <- A p, z <- A s, r <- b - A x,
    w <- A r, solver.c:498-500,522-526) with an identical carry — the
    fused speed applies to every non-replacement step."""
    from mpi_bicgstab_tpu.ops.dia import dia_spmv
    from mpi_bicgstab_tpu.solvers.base import exact_iters, SolveResult

    n0 = b.shape[0]
    n = _round_up(n0, 8192)
    offsets = A.offsets
    vals = A.vals
    if n != n0:
        vals = jnp.pad(vals, ((0, 0), (0, n - n0)))
        b = jnp.pad(b, (0, n - n0))
        x0 = jnp.pad(x0, (0, n - n0))
    Ap = DiaMatrix(vals, offsets, n, n)

    dtype = b.dtype
    tol2 = jnp.asarray(cfg.tol, dtype) ** 2
    max_iter = cfg.max_iter
    krr, nrr = cfg.krr, cfg.nrr

    r0 = b - dia_spmv(Ap, x0)
    r_hat = r0
    w0 = dia_spmv(Ap, r0)
    t0 = dia_spmv(Ap, w0)
    rTr0 = jnp.sum(r0 * r0)
    rTw0 = jnp.sum(r0 * w0)
    alpha0 = rTr0 / rTw0
    zero = jnp.asarray(0.0, dtype)
    zv = jnp.zeros_like(b)
    dot_zero = rTr0
    hist0 = jnp.full((max_iter,), jnp.nan, dtype)

    def cond(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        if exact_iters(cfg):   # tol=0 bench contract: exactly
            return k < max_iter  # max_iter iters (base.py)
        return (dot_r > dot_zero * tol2) & (k < max_iter)

    def fused_body(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        z2 = t + beta * (z - omega * v)             # solver.c:505-507
        v2, p2, s2, q, y, qTy, yTy = fused_phase_a(
            vals, z2, r, p, s, w, z,
            jnp.stack([alpha, beta, omega]), offsets,
            interpret=interpret)
        omega2 = qTy / yTy
        w2 = y - omega2 * (t - alpha * v2)          # solver.c:529-530
        t2, x2, r2, dot_new, rTr_new, rhTw, rhTs, rhTz = fused_phase_b(
            vals, w2, x, p2, q, y, r_hat, s2, z2,
            jnp.stack([alpha, omega2]), offsets, interpret=interpret)
        beta2 = (alpha / omega2) * (rTr_new / rTr)
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, t2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    def rr_body(c):
        (k, x, r, w, t, p, s, z, v, alpha, beta, omega, rTr, dot_r,
         hist) = c
        p2 = r + beta * (p - omega * s)             # solver.c:494-496
        s2 = dia_spmv(Ap, p2)                       # solver.c:499
        z2 = dia_spmv(Ap, s2)                       # solver.c:500
        q = r - alpha * s2                          # solver.c:510
        y = w - alpha * z2                          # solver.c:511
        qTy = jnp.sum(q * y)
        yTy = jnp.sum(y * y)
        v2 = dia_spmv(Ap, z2)                       # solver.c:514
        omega2 = qTy / yTy
        x2 = x + alpha * p2 + omega2 * q            # solver.c:519-520
        r2 = b - dia_spmv(Ap, x2)                   # solver.c:523-525
        w2 = dia_spmv(Ap, r2)                       # solver.c:526
        dot_new = jnp.sum(r2 * r2)
        rTr_new = jnp.sum(r_hat * r2)
        rhTw = jnp.sum(r_hat * w2)
        rhTs = jnp.sum(r_hat * s2)
        rhTz = jnp.sum(r_hat * z2)
        t2 = dia_spmv(Ap, w2)                       # solver.c:539
        beta2 = (alpha / omega2) * (rTr_new / rTr)
        alpha2 = rTr_new / (rhTw + beta2 * (rhTs - omega2 * rhTz))
        hist = hist.at[k].set(dot_new)
        return (k + 1, x2, r2, w2, t2, p2, s2, z2, v2, alpha2, beta2,
                omega2, rTr_new, dot_new, hist)

    def body(c):
        k = c[0]
        is_rr = (k % krr == 0) & (k > 0) & (k <= krr * nrr)
        return jax.lax.cond(is_rr, rr_body, fused_body, c)

    out = jax.lax.while_loop(cond, body, (
        jnp.int32(0), x0, r0, w0, t0, zv, zv, zv, zv, alpha0, zero,
        zero, rTr0, rTr0, hist0))
    k, x = out[0], out[1]
    dot_r, hist = out[13], out[14]
    relres = jnp.sqrt(dot_r / dot_zero)
    # true-residual gate on `converged` (solvers/base.SolveResult doc)
    r_true = b - dia_spmv(Ap, x)
    true_relres = jnp.sqrt(jnp.sum(r_true * r_true) / dot_zero)
    return SolveResult(x=x[:n0], n_iter=k, final_relres=relres,
                       history=jnp.sqrt(hist / dot_zero),
                       converged=(dot_r <= dot_zero * tol2)
                       & (true_relres <= 100.0 * jnp.sqrt(tol2)),
                       true_relres=true_relres)
