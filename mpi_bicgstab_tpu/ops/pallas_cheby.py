"""Fused Chebyshev-chain kernel (f32, DIA operators).

The XLA build of a degree-d Chebyshev application (ops/cheby.py) runs
d+1 separate SpMVs with axpy passes between them: every step re-reads
the band values (~W.n floats) and streams ~5 [n] vectors — HBM traffic
~ (d+1).(vals + 2n) + 3n.d. This kernel runs the ENTIRE chain in ONE
Pallas pass: the grid steps over row CHUNKS; each chunk DMAs its
(chunk + d*halo) window of the input vector AND of the band values
into VMEM once, then executes all d+1 multiplies and the x/r/d
recurrences entirely on the resident window (halo rows compute
redundantly-but-identically; validity shrinks one band-halo per step,
which the window's d-deep halo absorbs — the chunk-window trick of
ops/pallas_fused_classic.py, applied d times instead of once).

HBM traffic drops to ~1.15x (vals + v read + x write) TOTAL for the
whole degree-d application — the band values are read ~d times less,
the intermediate x/r/d vectors never leave VMEM. For the d=8 default
that is roughly an 8x traffic cut on the part of the preconditioned
iteration that dominates its cost.

Step coefficients are STATIC python floats (ops/cheby._coeffs) baked
at trace time — there is no scalar input at all.

Scope: f32 pure-DIA square operators, single device;
ops/cheby dispatches when `available()` holds and MBT_FUSED_CHEBY is
not '0'. (The distributed path keeps the XLA chain: its SpMV is the
halo-exchange closure, which has no windowed form.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix
from mpi_bicgstab_tpu.ops.pallas_spmv import _halo_rows

_LANES = 128
_TR = 64            # tile rows per compute slab
_SLACK = 8


def _budget_rows(offsets, degree: int, CH: int) -> tuple[int, int, int]:
    plr, phr = _halo_rows(offsets)
    h_lo, h_hi = degree * plr, degree * phr
    wr = h_lo + CH * _TR + h_hi + _SLACK
    return h_lo, h_hi, wr


def _vmem_budget() -> int:
    """Bytes of VMEM the window may use. 13 MB default (the budget the
    other fused kernels compile under on the v5e); MBT_CHEBY_VMEM_MB
    overrides — deep chains over wide-offset stencils (Transport's
    +/-m^2 diagonals cost ~112 halo rows PER STEP) need more to engage
    at high degree."""
    import os
    try:
        mb = float(os.environ.get("MBT_CHEBY_VMEM_MB", "13"))
    except ValueError:
        mb = 13.0
    return int(mb * 1024 * 1024)


def _pick_chunk(G: int, W: int, offsets, degree: int) -> int:
    """Largest divisor of G whose window (vector x4 + vals) fits the
    VMEM budget AND whose interior is at least half the window (below
    that the d-deep halo recompute dominates and the XLA chain is the
    better build)."""
    budget = _vmem_budget()
    for c in range(min(G, 32), 0, -1):
        if G % c:
            continue
        _, _, wr = _budget_rows(offsets, degree, c)
        vec_b = 4 * wr * _LANES * 4          # x, r, d, y windows
        vals_b = W * wr * _LANES * 4
        if vec_b + vals_b <= budget:
            return c
    return 0


def format_ok(A, dtype, degree: int) -> bool:
    from mpi_bicgstab_tpu.ops.precision import is_df
    if not isinstance(A, DiaMatrix) or dtype != jnp.float32:
        return False
    if is_df(A.vals) or A.vals.dtype != jnp.float32:
        return False
    if A.n_rows != A.n_cols or A.n_diags < 1 or degree < 1:
        return False
    n = -(-A.n_rows // (_TR * _LANES)) * (_TR * _LANES)
    G = n // _LANES // _TR
    CH = _pick_chunk(G, A.n_diags, A.offsets, degree)
    if CH == 0:
        return False
    # efficiency gate (auto-dispatch only): if the d-deep halo makes
    # the window more than 2x the interior, the redundant halo compute
    # dominates and the XLA chain is the better build
    _, _, wr = _budget_rows(A.offsets, degree, CH)
    return 2 * CH * _TR >= wr


def available(A, dtype, degree: int) -> bool:
    import os
    if os.environ.get("MBT_FUSED_CHEBY", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(A, dtype, degree)


def _dia_window(src, vals_w, base: int, rows: int, offsets):
    """rows of A @ src computed at window rows [base, base+rows), off
    the resident window `src` and the resident vals window `vals_w`
    (the ops/pallas_fused_pipe._dia_core access pattern, window-wide)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    acc = jnp.zeros((rows, _LANES), jnp.float32)
    for w, o in enumerate(offsets):
        q_, s_ = divmod(o, _LANES)
        if s_ == 0:
            aligned = src[pl.ds(base + q_, rows), :]
        else:
            r12 = src[pl.ds(base + q_, rows + 1), :]
            rolled = pltpu.roll(r12, np.int32(_LANES - s_), axis=1)
            aligned = jnp.where(lane < _LANES - s_, rolled[:rows],
                                rolled[1:])
        acc = acc + vals_w[w, pl.ds(base, rows), :] * aligned
    return acc


def _apply_window(fn, lo: int, hi: int):
    """Run fn(base, rows) over [lo, hi) in _TR-row slabs (static)."""
    base = lo
    while base < hi:
        fn(base, min(_TR, hi - base))
        base += min(_TR, hi - base)


def _cheby_kernel(vp, valsp, x_ref, xw, rw, dw, yw, vals_w,
                  sem_v, sem_m, *, offsets, degree, coeffs, inv_theta,
                  h_lo, h_hi, CH, plr, phr):
    """One chunk: window-resident degree-`degree` Chebyshev chain."""
    c = pl.program_id(0)
    wr = xw.shape[0]
    row0 = c * (CH * _TR)
    # window DMAs: the input vector (into rw — it starts life as v)
    # and the band values
    dma_v = pltpu.make_async_copy(vp.at[pl.ds(row0, wr), :], rw, sem_v)
    dma_m = pltpu.make_async_copy(valsp.at[:, pl.ds(row0, wr), :],
                                  vals_w, sem_m)
    dma_v.start()
    dma_m.start()
    dma_v.wait()
    dma_m.wait()

    # compute region: every row whose band reads stay inside the window
    lo, hi = plr, wr - phr - 1
    # x = v / theta (valid everywhere); r = v - A x; d = r / theta
    xw[...] = inv_theta * rw[...]

    def _init(base, rows):
        ax = _dia_window(xw, vals_w, base, rows, offsets)
        rr = rw[pl.ds(base, rows), :] - ax
        rw[pl.ds(base, rows), :] = rr
        dw[pl.ds(base, rows), :] = inv_theta * rr

    _apply_window(_init, lo, hi)

    for (c_d, c_r) in coeffs:
        # two phases per step: the band multiply must read the OLD d
        # everywhere before any slab overwrites it (a slab's reads
        # reach plr rows into its neighbours)
        def _mult(base, rows):
            yw[pl.ds(base, rows), :] = _dia_window(dw, vals_w, base,
                                                   rows, offsets)

        _apply_window(_mult, lo, hi)

        def _update(base, rows, c_d=c_d, c_r=c_r):
            xw[pl.ds(base, rows), :] = (xw[pl.ds(base, rows), :]
                                        + dw[pl.ds(base, rows), :])
            rr = (rw[pl.ds(base, rows), :]
                  - yw[pl.ds(base, rows), :])
            rw[pl.ds(base, rows), :] = rr
            dw[pl.ds(base, rows), :] = (c_d * dw[pl.ds(base, rows), :]
                                        + c_r * rr)

        _apply_window(_update, lo, hi)
    # NOTE on validity: halo rows go stale one band-halo per multiply;
    # the interior [h_lo, h_lo + CH*_TR) stays exact through all
    # degree+1 multiplies because h_lo = degree*plr (the final d_k that
    # feeds x needs only degree halos; the last r update's staleness
    # never reaches x)
    x_ref[...] = xw[pl.ds(h_lo, CH * _TR), :]


@partial(jax.jit, static_argnames=("offsets", "degree", "lo", "hi",
                                   "interpret"))
def cheby_chain(vals, v, offsets: tuple, degree: int, lo: float,
                hi: float, interpret: bool = False):
    """x = p(A) v — the whole degree-d Chebyshev application as ONE
    Pallas pass (window-resident chain). Bit-comparable to
    ops/cheby.cheby_apply up to f32 reassociation."""
    from mpi_bicgstab_tpu.ops.cheby import _coeffs
    inv_theta, pairs = _coeffs(degree, lo, hi)
    # pad to the kernel's row-tile grid (zero rows are inert: the DIA
    # builder already zeroes out-of-range diagonal slots, so boundary
    # rows read 0*0). Without this, an n whose nr = n/128 is not a
    # multiple of _TR would leave the last nr % _TR row-tiles of every
    # output UNWRITTEN (the grid rounds down) — exactly the shapes the
    # CLI's multiple=1024 padding produces.
    n0 = v.shape[0]
    blk = _TR * _LANES
    n = -(-n0 // blk) * blk
    if n != n0:
        v = jnp.pad(v, (0, n - n0))
        vals = jnp.pad(vals, ((0, 0), (0, n - n0)))
    nr = n // _LANES
    G = nr // _TR
    W = len(offsets)
    CH = _pick_chunk(G, W, offsets, degree)
    if CH == 0:
        raise ValueError("cheby_chain: window does not fit VMEM")
    plr, phr = _halo_rows(offsets)
    h_lo, h_hi, wr = _budget_rows(offsets, degree, CH)
    # zero-padded window sources: out-of-range rows read 0 (zero vals
    # rows multiply to 0, zero vector rows stay 0 — inert)
    vp = jnp.zeros((h_lo + nr + h_hi + _SLACK, _LANES), jnp.float32)
    vp = vp.at[h_lo:h_lo + nr, :].set(v.reshape(nr, _LANES))
    valsp = jnp.zeros((W, h_lo + nr + h_hi + _SLACK, _LANES),
                      jnp.float32)
    valsp = valsp.at[:, h_lo:h_lo + nr, :].set(
        vals.reshape(W, nr, _LANES))
    out = pl.pallas_call(
        partial(_cheby_kernel, offsets=offsets, degree=degree,
                coeffs=tuple(pairs), inv_theta=inv_theta, h_lo=h_lo,
                h_hi=h_hi, CH=CH, plr=plr, phr=phr),
        grid=(G // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((CH * _TR, _LANES), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wr, _LANES), jnp.float32)] * 4
        + [pltpu.VMEM((W, wr, _LANES), jnp.float32)]
        + [pltpu.SemaphoreType.DMA(())] * 2,
        interpret=interpret,
    )(vp, valsp)
    return out.reshape(n)[:n0]
