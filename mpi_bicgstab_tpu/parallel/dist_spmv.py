"""Distributed SpMV bodies (called inside shard_map).

Two variants, mirroring the reference's two halo-exchange strategies:

* allgather (default) — MPI_csr_spmv_ovlap (matrix.c:428-441): gather the
  full iterate, diagonal-block multiply while the gather is in flight
  (XLA's async collectives + latency-hiding scheduler take the role of
  the Iallgatherv/Wait placement), then off-diagonal multiply.

* ring — MPI_csr_spmv_async (matrix.c:450-492), the point-to-point
  Isend/Irecv/Waitsome path ("slower than Allgatherv, unused"
  matrix.c:448). Here: lax.ppermute rotates each shard's slice around
  the ring; at every step the off-diagonal columns owned by the current
  source shard are multiplied. Kept for parity and for topologies where
  neighbor-limited sparsity makes a ring cheaper than a full gather.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.ell import EllMatrix
from mpi_bicgstab_tpu.ops.spmv import ell_spmv
from mpi_bicgstab_tpu.parallel.comm import Comm


def _tmap(f, *trees):
    import jax
    return jax.tree_util.tree_map(f, *trees)


def spmv_dia_halo(vals_loc, offsets: tuple, halo: int, comm: Comm, x_loc,
                  n_devices: int):
    """Distributed DIA SpMV with neighbor halo exchange.

    Two lax.ppermute edge transfers of `halo` elements replace the
    reference's full-vector Iallgatherv (matrix.c:432): per-shard comm
    volume drops from O(n_global) to O(band width). Non-circular ring —
    edge shards receive zeros, matching the zero vals beyond the matrix
    boundary. DF operands (double-float pairs, ops/precision) permute
    leafwise and accumulate with compensated multiply-adds."""
    from mpi_bicgstab_tpu.ops.precision import df_add, df_mul, is_df
    df = is_df(x_loc)
    n_loc = x_loc.shape[0]
    if halo > 0 and n_devices > 1 and comm.axis is not None:
        fwd = [(i, i + 1) for i in range(n_devices - 1)]
        bwd = [(i + 1, i) for i in range(n_devices - 1)]
        prev_tail = _tmap(lambda a: lax.ppermute(a[n_loc - halo:],
                                                 comm.axis, fwd), x_loc)
        next_head = _tmap(lambda a: lax.ppermute(a[:halo], comm.axis, bwd),
                          x_loc)
        xh = _tmap(lambda p, x, nx: jnp.concatenate([p, x, nx]),
                   prev_tail, x_loc, next_head)
        xh = comm.seq(xh)      # nooverlap: halo exchange completes first
    elif halo > 0:
        xh = _tmap(lambda a: jnp.pad(a, (halo, halo)), x_loc)
    else:
        xh = x_loc

    def seg(w, o):
        sl = _tmap(lambda a: lax.slice_in_dim(a, halo + o, halo + o + n_loc),
                   xh)
        return df_mul(vals_loc[w], sl) if df else vals_loc[w] * sl

    from mpi_bicgstab_tpu.ops.precision import df_zeros_like
    acc = df_zeros_like(x_loc) if df else jnp.zeros_like(x_loc)
    for w, o in enumerate(offsets):
        acc = df_add(acc, seg(w, o)) if df else acc + seg(w, o)
    return acc


def spmv_dia_gather(vals_loc, offsets: tuple, comm: Comm, x_loc):
    """Fallback for bands wider than a shard: all_gather the iterate and
    take dynamic slices at row_start + offset."""
    from mpi_bicgstab_tpu.ops.precision import df_add, df_mul, is_df
    df = is_df(x_loc)
    x_full = comm.allgather(x_loc)
    x_full = comm.seq(x_full)
    n_loc = x_loc.shape[0]
    lo = -min(0, min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xp = _tmap(lambda a: jnp.pad(a, (lo, hi)), x_full)
    row_start = comm.axis_index() * n_loc

    def seg(w, o):
        sl = _tmap(lambda a: lax.dynamic_slice(a, (lo + row_start + o,),
                                               (n_loc,)), xp)
        return df_mul(vals_loc[w], sl) if df else vals_loc[w] * sl

    from mpi_bicgstab_tpu.ops.precision import df_zeros_like
    acc = df_zeros_like(x_loc) if df else jnp.zeros_like(x_loc)
    for w, o in enumerate(offsets):
        acc = df_add(acc, seg(w, o)) if df else acc + seg(w, o)
    return acc


def spmv_allgather(diag: EllMatrix, offd: EllMatrix, comm: Comm, x_loc):
    """y_loc = A_loc_diag @ x_loc + A_loc_offd @ allgather(x).

    Under comm.serialize the gather must COMPLETE before the diag
    multiply starts (the reference's nooverlap A/B — normally the diag
    multiply hides the gather, matrix.c:432-437)."""
    from mpi_bicgstab_tpu.ops.precision import df_add, is_df
    x_full = comm.allgather(x_loc)
    x_loc, x_full = comm.seq(x_loc, x_full)
    if is_df(x_loc):
        from mpi_bicgstab_tpu.ops.spmv import ell_spmv_df
        return df_add(ell_spmv_df(diag, x_loc), ell_spmv_df(offd, x_full))
    y = ell_spmv(diag, x_loc)          # overlaps the gather (matrix.c:437)
    return y + ell_spmv(offd, x_full)  # needs gathered x (matrix.c:440)


def spmv_ring(diag: EllMatrix, offd: EllMatrix, comm: Comm, x_loc,
              n_devices: int):
    """Ring-permute halo exchange: P-1 ppermute hops; at hop h each shard
    holds the slice of the shard h positions up the ring and multiplies
    the offd columns that fall in that source's range. DF operands
    (double-float pairs) permute leafwise; the per-hop masked
    multiply-accumulate uses the compensated df ops."""
    from mpi_bicgstab_tpu.ops.precision import (DF, df_add, df_mul,
                                                df_where, df_zeros_like,
                                                is_df)
    df = is_df(x_loc)
    axis = comm.axis
    n_loc = x_loc.shape[0]
    me = lax.axis_index(axis)
    if df:
        from mpi_bicgstab_tpu.ops.spmv import ell_spmv_df
        y = ell_spmv_df(diag, x_loc)
    else:
        y = ell_spmv(diag, x_loc)

    offd_block = offd.cols // n_loc   # source shard of each offd column
    local_col = offd.cols % n_loc

    def hop(h, carry):
        y, buf = carry
        # after h hops the buffer holds the slice of shard (me + h) % P
        src = (me + h) % n_devices
        if df:
            vals = df_where(offd_block == src, offd.vals, 0.0)
            acc = df_zeros_like(y)
            for w in range(offd.width):
                acc = df_add(acc, df_mul(vals[w], buf[local_col[w]]))
            y = df_add(y, acc)
        else:
            vals = jnp.where(offd_block == src, offd.vals,
                             jnp.zeros_like(offd.vals))
            acc = jnp.zeros_like(y)
            for w in range(offd.width):
                acc = acc + vals[w] * buf[local_col[w]]
            y = y + acc
        perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]
        buf = _tmap(lambda a: lax.ppermute(a, axis, perm), buf)
        return y, buf

    buf = x_loc
    # hop 0 multiplies our own slice's offd columns (normally none, but
    # width-capped tails can leave local columns in the offd block)
    y, buf = lax.fori_loop(1, n_devices, hop, hop(0, (y, buf)))
    if offd.tail_size:
        # tails are rare; fall back to one gather for them
        import jax
        x_full = comm.allgather(x_loc)
        if df:
            t = df_mul(offd.tail_vals, x_full[offd.tail_cols])
            y = df_add(y, DF(
                jax.ops.segment_sum(t.hi, offd.tail_rows,
                                    num_segments=offd.n_rows),
                jax.ops.segment_sum(t.lo, offd.tail_rows,
                                    num_segments=offd.n_rows)))
        else:
            tail = offd.tail_vals * x_full[offd.tail_cols]
            y = y + jax.ops.segment_sum(tail, offd.tail_rows,
                                        num_segments=offd.n_rows)
    return y
