"""1-D row partitioning of a CSR matrix into diag / offd ELL blocks.

Rebuilds the reference's distributed loader semantics
(MPI_coo_load_matrix_block, matrix.c:268-396): each shard owns a
contiguous row block; within its rows, entries whose column falls inside
the shard's own row range form the square *diagonal block* (stored with
LOCAL column indices, matrix.c:343-348) and the rest form the
*off-diagonal block* (GLOBAL column indices, matrix.c:350-355):

        |----|--------------|
        | d0 |     od0      | <- shard 0      (diagram matrix.c:248-257)
        |----|----|---------|
        |od1 | d1 |   od1   | <- shard 1
        |----|----|----|----|

Differences from the reference, by design:
  * equal shard sizes — we pad the matrix with identity rows to a
    multiple of n_devices instead of giving remainder rows to the first
    ranks (matrix.c:295-298), because SPMD shards must be shape-identical.
  * the file is parsed ONCE on the host and partitioned in memory; the
    reference re-reads the entire .mtx twice per rank (matrix.c:315-393,
    its documented IO hotspot).
  * blocks are stored slab-major ELL (ops/ell.py), not CSR; all shards
    share one ELL width / tail size so the stacked arrays are rectangular.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np

from mpi_bicgstab_tpu.models.problem import pad_csr_identity
from mpi_bicgstab_tpu.ops.ell import EllMatrix, csr_to_ell
from mpi_bicgstab_tpu.ops.sparse import CSRMatrix


@partial(jax.tree_util.register_dataclass,
         data_fields=["diag_cols", "diag_vals", "diag_tail_rows",
                      "diag_tail_cols", "diag_tail_vals",
                      "offd_cols", "offd_vals", "offd_tail_rows",
                      "offd_tail_cols", "offd_tail_vals"],
         meta_fields=["n_devices", "n_loc", "n_global", "n_logical"])
@dataclasses.dataclass(frozen=True)
class PartitionedMatrix:
    """Stacked per-shard diag/offd ELL blocks.

    Slab arrays are [width, n_devices * n_loc] (shard along dim 1,
    spec P(None, 'rows')); tail arrays are [n_devices * tail_size]
    (shard along dim 0, spec P('rows')). Tail row indices are LOCAL to
    the shard. diag column indices are local; offd are global.
    """

    diag_cols: np.ndarray | jax.Array
    diag_vals: np.ndarray | jax.Array
    diag_tail_rows: np.ndarray | jax.Array
    diag_tail_cols: np.ndarray | jax.Array
    diag_tail_vals: np.ndarray | jax.Array
    offd_cols: np.ndarray | jax.Array
    offd_vals: np.ndarray | jax.Array
    offd_tail_rows: np.ndarray | jax.Array
    offd_tail_cols: np.ndarray | jax.Array
    offd_tail_vals: np.ndarray | jax.Array
    n_devices: int
    n_loc: int
    n_global: int   # padded global size = n_devices * n_loc
    n_logical: int  # rows before padding

    def local_blocks(self, diag_cols, diag_vals, dtr, dtc, dtv,
                     offd_cols, offd_vals, otr, otc, otv):
        """Wrap *local shard* arrays into EllMatrix blocks (called inside
        shard_map where arrays have local shapes)."""
        diag = EllMatrix(diag_cols, diag_vals, dtr, dtc, dtv,
                         self.n_loc, self.n_loc)
        offd = EllMatrix(offd_cols, offd_vals, otr, otc, otv,
                         self.n_loc, self.n_global)
        return diag, offd

    @property
    def arrays(self):
        return (self.diag_cols, self.diag_vals, self.diag_tail_rows,
                self.diag_tail_cols, self.diag_tail_vals,
                self.offd_cols, self.offd_vals, self.offd_tail_rows,
                self.offd_tail_cols, self.offd_tail_vals)


def _csr_row_block(csr: CSRMatrix, start: int, end: int,
                   col_lo: int, col_hi: int, localize: bool,
                   n_cols: int) -> CSRMatrix:
    """Extract rows [start, end), keeping only columns inside [col_lo,
    col_hi) if localize else outside. Mirrors the count/fill split logic
    at matrix.c:315-355."""
    lo, hi = csr.ptr[start], csr.ptr[end]
    col = csr.col[lo:hi]
    val = csr.val[lo:hi]
    rows = np.repeat(np.arange(end - start, dtype=np.int64),
                     np.diff(csr.ptr[start:end + 1]))
    inside = (col >= col_lo) & (col < col_hi)
    keep = inside if localize else ~inside
    col_k = col[keep] - (col_lo if localize else 0)
    val_k = val[keep]
    rows_k = rows[keep]
    counts = np.bincount(rows_k, minlength=end - start)
    ptr = np.zeros(end - start + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    return CSRMatrix(ptr, col_k, val_k, (end - start, n_cols))


def partition_csr(csr: CSRMatrix, n_devices: int, dtype=None,
                  width: int | None = None) -> PartitionedMatrix:
    """Partition a square CSR into n_devices stacked diag/offd ELL blocks.

    Pads to n_global = ceil(n / (8 * n_devices)) * 8 * n_devices with
    identity rows (harmless: padded RHS entries are 0)."""
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("matrix must be square")
    n_logical = csr.nrows
    csr = pad_csr_identity(csr, 8 * n_devices)
    n_global = csr.nrows
    n_loc = n_global // n_devices

    diag_blocks, offd_blocks = [], []
    for d in range(n_devices):
        s, e = d * n_loc, (d + 1) * n_loc
        diag_blocks.append(_csr_row_block(csr, s, e, s, e, True, n_loc))
        offd_blocks.append(_csr_row_block(csr, s, e, s, e, False, n_global))

    def stack(blocks, n_cols):
        w = max(1, max(int(b.row_lengths.max()) if b.nnz else 0
                       for b in blocks))
        if width is not None:
            w = min(w, width)
        tail = max((max((b.row_lengths - w).clip(min=0).sum()
                        for b in blocks), 0))
        ells = [csr_to_ell(b, width=w, tail_pad=int(tail), dtype=dtype,
                           device_put=False) for b in blocks]
        cols = np.concatenate([e.cols for e in ells], axis=1)
        vals = np.concatenate([e.vals for e in ells], axis=1)
        t_rows = np.concatenate([e.tail_rows for e in ells])
        t_cols = np.concatenate([e.tail_cols for e in ells])
        t_vals = np.concatenate([e.tail_vals for e in ells])
        return cols, vals, t_rows, t_cols, t_vals

    dc, dv, dtr, dtc, dtv = stack(diag_blocks, n_loc)
    oc, ov, otr, otc, otv = stack(offd_blocks, n_global)
    return PartitionedMatrix(dc, dv, dtr, dtc, dtv, oc, ov, otr, otc, otv,
                             n_devices, n_loc, n_global, n_logical)
