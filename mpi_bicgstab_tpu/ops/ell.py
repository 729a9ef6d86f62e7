"""Padded ELL (ITPACK) device layout for TPU SpMV.

The reference computes SpMV straight off CSR with a scalar inner loop
(mult, matrix.c:498-516). CSR's ragged rows defeat the TPU's 8x128
vector-lane model, so the device layout here is slab-major ELLPACK:

    cols[w, i], vals[w, i]   for w in [0, width), i in [0, n_rows)

i.e. slab w holds every row's w-th stored entry (cols padded with 0,
vals padded with 0.0). SpMV is then `width` dense gathers + FMAs over
full-length vectors — exactly the shape the VPU and XLA's gather lowering
like. Rows longer than `width` spill into a fixed-size COO tail handled
by a segment-sum (rare; only when an explicit width cap is given).

The split into a square diagonal block (local columns) and an
off-diagonal block (global columns) from the reference (matrix.c:248-257)
happens above this layer, in parallel/partition.py; both blocks are
EllMatrix instances.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals", "tail_rows", "tail_cols", "tail_vals"],
         meta_fields=["n_rows", "n_cols"])
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Slab-major ELL sparse matrix (+ optional fixed-size COO tail).

    cols: int32 [width, n_rows] — column index of each row's w-th entry
          (0 where padded; the matching vals entry is 0.0 so the gather
          of x[0] contributes nothing).
    vals: [width, n_rows]
    tail_*: overflow entries for rows longer than `width`; padded to a
          static size with val 0.0 / row n_rows-1 / col 0.
    """

    cols: jax.Array
    vals: jax.Array
    tail_rows: jax.Array  # int32 [tail_size]
    tail_cols: jax.Array  # int32 [tail_size]
    tail_vals: jax.Array  # [tail_size]
    n_rows: int
    n_cols: int

    @property
    def width(self) -> int:
        return self.cols.shape[0]

    @property
    def tail_size(self) -> int:
        return self.tail_vals.shape[0]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz_stored(self) -> int:
        """Dense storage footprint (includes padding)."""
        return self.cols.size + self.tail_size


def csr_to_ell(csr, width: int | None = None, tail_pad: int = 0,
               dtype=None, device_put: bool = True) -> EllMatrix:
    """Build the slab-major ELL layout from a host CSRMatrix.

    width: exact slab count per row (default: the max row length, so the
        tail is empty). Rows longer than width spill to the tail; a width
        larger than every row just pads (used to equalize shard widths).
    tail_pad: round the tail up to at least this size (static shape aid).
    """
    lengths = csr.row_lengths
    n_rows, n_cols = csr.shape
    max_len = int(lengths.max()) if n_rows and lengths.size else 0
    W = max_len if width is None else int(width)
    W = max(W, 1)

    rows = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    offs = np.arange(csr.nnz, dtype=np.int64) - csr.ptr[rows]

    cols = np.zeros((W, n_rows), dtype=np.int32)
    df_mode = dtype == "df32"
    vals_dtype = np.float64 if df_mode else (dtype or csr.val.dtype)
    vals = np.zeros((W, n_rows), dtype=vals_dtype)
    in_ell = offs < W
    cols[offs[in_ell], rows[in_ell]] = csr.col[in_ell]
    vals[offs[in_ell], rows[in_ell]] = csr.val[in_ell]

    n_tail = int((~in_ell).sum())
    tail_size = max(n_tail, tail_pad)
    t_rows = np.full(tail_size, max(n_rows - 1, 0), dtype=np.int32)
    t_cols = np.zeros(tail_size, dtype=np.int32)
    t_vals = np.zeros(tail_size, dtype=vals_dtype)
    if n_tail:
        t_rows[:n_tail] = rows[~in_ell]
        t_cols[:n_tail] = csr.col[~in_ell]
        t_vals[:n_tail] = csr.val[~in_ell]

    if df_mode:
        from mpi_bicgstab_tpu.ops.precision import df_from_f64
        return EllMatrix(jnp.asarray(cols), df_from_f64(vals),
                         jnp.asarray(t_rows), jnp.asarray(t_cols),
                         df_from_f64(t_vals), n_rows, n_cols)
    put = jnp.asarray if device_put else (lambda a: a)
    return EllMatrix(put(cols), put(vals), put(t_rows), put(t_cols),
                     put(t_vals), n_rows, n_cols)


def ell_to_dense(A: EllMatrix) -> np.ndarray:
    """Host-side densify for tests."""
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    d = np.zeros((A.n_rows, A.n_cols), dtype=vals.dtype)
    rows = np.broadcast_to(np.arange(A.n_rows), cols.shape)
    np.add.at(d, (rows.ravel(), cols.ravel()), vals.ravel())
    np.add.at(d, (np.asarray(A.tail_rows), np.asarray(A.tail_cols)),
              np.asarray(A.tail_vals))
    return d
