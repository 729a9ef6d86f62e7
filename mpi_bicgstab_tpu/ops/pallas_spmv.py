"""Hand-tuned Pallas TPU kernel for DIA SpMV.

The XLA path (ops/dia.py dia_spmv) is `jnp.pad(x)` + W static slices +
FMAs; XLA fuses the FMA chain to roofline but still materializes the
padded iterate in HBM — an extra write+read of the full vector
(~12.8 MB at Transport scale, ~10% of total SpMV traffic). This kernel
removes it:

  * x is DMA'd HBM->VMEM ONCE into a resident scratch whose halo rows
    are zero-filled in VMEM — the pad never exists in HBM.
  * vals stream through double-buffered [W, Tr, 128] VMEM blocks (the
    Mosaic pipeline handles the HBM prefetch).
  * everything is laid out 2-D as (rows, 128 lanes); a diagonal offset
    o = q*128 + s becomes a dynamic SUBLANE slice (start rs + q) plus a
    STATIC lane roll by s with a carry select between adjacent rows —
    Mosaic cannot do element-granularity dynamic slices along lanes,
    but sublane-dim slices and static lane rotates lower cleanly.

Traffic: vals (nnz*4B) + x + y, the true minimum for DIA SpMV — vs the
XLA path's vals + 2x + xpad + y. Grid steps run sequentially on the
TensorCore, so the step-0 DMA is ordered before every tile's compute.

Rebuilds the hot kernel role of `mult` (reference matrix.c:498-516) on
the DIA layout; the layout rationale is in ops/dia.py.

Known limitation: with jax_enable_x64 on, offset sets with nonzero
lane shifts fail Mosaic legalization on real TPU ('failed to legalize
func.return'; the roll-shift i64 issue is separately forced to int32
below). The kernel targets the f32 solver pipeline, where x64 is off
and every tested configuration compiles bit-exact vs the XLA path on
the chip.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpi_bicgstab_tpu.ops.dia import DiaMatrix

_LANES = 128
_SUBLANES = 8
# VMEM budget for the resident iterate scratch (leave room for the vals
# double buffer and the output tile under the ~16 MB/core limit).
_XP_VMEM_BYTES = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _halo_rows(offsets) -> tuple[int, int]:
    """(rows below, rows above) the local block the offsets reach,
    rounded to the sublane tile so the step-0 DMA lands aligned."""
    qs = [o // _LANES for o in offsets]
    lo_r = max(0, -min(qs)) if offsets else 0
    hi_r = max(0, max(o // _LANES + (1 if o % _LANES else 0)
                      for o in offsets)) if offsets else 0
    return _round_up(lo_r, _SUBLANES), _round_up(hi_r, _SUBLANES)


def available(A: DiaMatrix, block_rows: int = 8192) -> bool:
    """Can the resident-iterate kernel run this operator? Budgets the
    FULL VMEM picture: the resident iterate scratch PLUS the Mosaic
    pipeline's double-buffered vals blocks and the output tile, against
    a conservative ~14 MB of the ~16 MB/core."""
    n = A.n_rows
    if n % block_rows or block_rows % (_LANES * _SUBLANES):
        return False
    plr, phr = _halo_rows(A.offsets)
    itemsize = jnp.dtype(A.dtype).itemsize
    xp_bytes = (plr + n // _LANES + phr) * _LANES * itemsize
    vals_bytes = 2 * A.n_diags * block_rows * itemsize   # double buffer
    y_bytes = 2 * block_rows * itemsize
    return (A.n_diags >= 1
            and xp_bytes <= _XP_VMEM_BYTES
            and xp_bytes + vals_bytes + y_bytes <= 14 * 1024 * 1024)


def _kernel(x_hbm, vals_ref, y_ref, xp, sem, *, offsets, plr, nr, tr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        if plr:
            xp[pl.ds(0, plr), :] = jnp.zeros((plr, _LANES), xp.dtype)
        tail = xp.shape[0] - plr - nr
        if tail:
            xp[pl.ds(plr + nr, tail), :] = jnp.zeros((tail, _LANES),
                                                     xp.dtype)
        dma = pltpu.make_async_copy(x_hbm, xp.at[pl.ds(plr, nr), :], sem)
        dma.start()
        dma.wait()

    rs = i * tr
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANES), 1)
    acc = jnp.zeros((tr, _LANES), vals_ref.dtype)
    for w, o in enumerate(offsets):
        q, s = divmod(o, _LANES)
        if s == 0:
            aligned = xp[pl.ds(rs + plr + q, tr), :]
        else:
            # one (tr+1)-row window, ONE lane roll (left-roll by s ==
            # right-roll by 128-s; pltpu.roll wants >= 0), then select
            # between its two row-shifted views for the lane carry.
            # int32 shift: under jax_enable_x64 a bare python int traces
            # as i64, which Mosaic's tpu.dynamic_rotate rejects
            r12 = xp[pl.ds(rs + plr + q, tr + 1), :]
            rolled = pltpu.roll(r12, np.int32(_LANES - s), axis=1)
            aligned = jnp.where(lane < _LANES - s, rolled[:tr],
                                rolled[1:])
        acc = acc + vals_ref[w] * aligned
    y_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "block_rows"))
def _dia_spmv_pallas(vals, x, offsets: tuple, block_rows: int):
    n = x.shape[0]
    W = len(offsets)
    nr = n // _LANES
    tr = block_rows // _LANES
    plr, phr = _halo_rows(offsets)
    grid = nr // tr

    y2 = pl.pallas_call(
        partial(_kernel, offsets=offsets, plr=plr, nr=nr, tr=tr),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec((W, tr, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # vals stream
        ],
        out_specs=pl.BlockSpec((tr, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr, _LANES), vals.dtype),
        scratch_shapes=[
            pltpu.VMEM((plr + nr + phr, _LANES), vals.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * W * n,
            bytes_accessed=(W * n + 2 * n) * jnp.dtype(vals.dtype).itemsize,
            transcendentals=0,
        ),
    )(x.reshape(nr, _LANES), vals.reshape(W, nr, _LANES))
    return y2.reshape(n)


def dia_spmv_pallas(A: DiaMatrix, x: jax.Array,
                    block_rows: int = 8192) -> jax.Array:
    """y = A @ x with the resident-iterate Pallas kernel.

    Caller must check `available(A, block_rows)`; semantics match
    ops/dia.dia_spmv exactly (zero vals outside the band make halo reads
    inert, mirroring the XLA path's zero padding)."""
    x = x.astype(A.vals.dtype)
    return _dia_spmv_pallas(A.vals, x, A.offsets, block_rows)


def _env_choice() -> str:
    return os.environ.get("MBT_PALLAS", "auto").lower()


def use_pallas_for(A) -> bool:
    """Routing policy for ops/layout.spmv. Default OFF: measured on a
    v5e, the plain-SpMV kernel is VPU-bound on the per-offset lane
    rolls (~243us at Transport scale) while the XLA pad+slice path runs
    ~198us, both near the ~156us HBM floor — the kernel's payoff is as
    the base for fused iteration epilogues, not raw SpMV. MBT_PALLAS=1
    opts in (benchmark A/B, interpret-mode testing)."""
    choice = _env_choice()
    if choice not in ("1", "on", "true"):
        return False
    import jax
    if jax.config.jax_enable_x64 and jax.default_backend() == "tpu":
        # PERMANENT FENCE for the known Mosaic hazard: under x64,
        # kernels with nonzero lane-shift rolls fail legalization on
        # real TPUs ('failed to legalize func.return'); the f32
        # production pipeline never enables x64 on device. Verified by
        # scripts/chip_pallas_check.py (which runs x64-off).
        return False
    return isinstance(A, DiaMatrix) and available(A)
