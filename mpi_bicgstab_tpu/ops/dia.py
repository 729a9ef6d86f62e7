"""DIA (diagonal) device layout — the TPU fast path for SpMV.

Measured on TPU v5e: a 15-diagonal, 24M-nnz SpMV in this layout runs at
~100-230 Gnnz/s (HBM-bound; the shared relay's effective bandwidth
varies run to run — the vals arrays stream once and the iterate stays
on-chip across the fused slice-multiply-adds), three orders of
magnitude faster than the gather-based ELL path, which XLA lowers to
scalar element loads on TPU (~0.13 Gnnz/s).

Why this is the right primary layout for this framework: the workload
class is PDE/transport operators (the reference benchmarks SuiteSparse
Transport, a 3D FEM transport matrix; its job scripts run stencil-like
systems) whose nonzeros concentrate on a few dozen global diagonals.
`analyze_diagonals` measures that concentration at load time and
`build_operator` (ops/layout.py) routes matrices between:

    DIA   — nonzeros on <= max_diags offsets (stencils, banded)
    DIA + ELL tail (hybrid) — mostly-banded with stragglers
    ELL   — unstructured fallback (correct, slow on TPU)

A shift y += v_o * x[i+o] is a static slice of a padded x — no indices
in memory at all (DIA also stores 0 integers/nnz vs ELL's 1), no gather.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["vals"],
         meta_fields=["offsets", "n_rows", "n_cols"])
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Square diagonal-format sparse matrix.

    vals[w, i] = A[i, i + offsets[w]] (0 where out of range / absent).
    offsets is a static tuple -> slice positions compile into the kernel.
    """

    vals: jax.Array            # [n_diags, n_rows]
    offsets: tuple             # len n_diags, python ints
    n_rows: int
    n_cols: int

    @property
    def n_diags(self) -> int:
        return len(self.offsets)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def pad(self) -> tuple[int, int]:
        """(left, right) padding the SpMV needs around x."""
        lo = -min(0, min(self.offsets)) if self.offsets else 0
        hi = max(0, max(self.offsets)) if self.offsets else 0
        return (lo, hi)


def analyze_diagonals(csr, max_diags: int = 64, min_fill: float = 0.02):
    """Pick the offsets worth storing as dense diagonals.

    Returns (offsets, coverage): offsets with at least min_fill * n
    entries, at most max_diags of them (largest population first),
    and the fraction of nnz they cover.
    """
    rows = np.repeat(np.arange(csr.nrows, dtype=np.int64), csr.row_lengths)
    offs = csr.col - rows
    uniq, counts = np.unique(offs, return_counts=True)
    order = np.argsort(-counts)
    uniq, counts = uniq[order], counts[order]
    keep = counts >= max(1, int(min_fill * csr.nrows))
    uniq, counts = uniq[keep][:max_diags], counts[keep][:max_diags]
    coverage = counts.sum() / max(csr.nnz, 1)
    return tuple(int(o) for o in np.sort(uniq)), float(coverage)


def csr_to_dia(csr, offsets, dtype=None, device_put: bool = True):
    """Extract `offsets` into a DiaMatrix; returns (dia, remainder_csr).

    remainder_csr holds every entry NOT on the chosen offsets (None if
    fully covered). Duplicate entries on a kept offset accumulate.
    dtype='df32' stores vals as a double-float pair (ops/precision) for
    the extended-precision data path.
    """
    from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr

    n = csr.nrows
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("DIA layout requires a square matrix")
    offsets = tuple(int(o) for o in offsets)
    df_mode = dtype == "df32"
    vals_dtype = np.float64 if df_mode else (dtype or csr.val.dtype)
    rows = np.repeat(np.arange(n, dtype=np.int64), csr.row_lengths)
    entry_off = csr.col - rows

    W = len(offsets)
    vals = np.zeros((max(W, 1), n), dtype=vals_dtype)
    off_index = {o: w for w, o in enumerate(offsets)}
    # map each entry to its diagonal slot (or -1)
    slot = np.full(csr.nnz, -1, dtype=np.int64)
    for o, w in off_index.items():
        slot[entry_off == o] = w
    on_dia = slot >= 0
    np.add.at(vals, (slot[on_dia], rows[on_dia]), csr.val[on_dia])

    remainder = None
    if (~on_dia).any():
        rem = COOMatrix(rows[~on_dia], csr.col[~on_dia],
                        csr.val[~on_dia], csr.shape)
        remainder = coo_to_csr(rem)

    if df_mode:
        from mpi_bicgstab_tpu.ops.precision import df_from_f64
        dia = DiaMatrix(df_from_f64(vals), offsets, n, n)
        return dia, remainder
    put = jnp.asarray if device_put else (lambda a: a)
    dia = DiaMatrix(put(vals), offsets, n, n)
    return dia, remainder


def dia_spmv(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x via padded static slices (no gathers, no index loads)."""
    lo, hi = A.pad
    xp = jnp.pad(x, (lo, hi))
    acc = jnp.zeros((A.n_rows,), dtype=jnp.result_type(A.vals, x))
    for w, o in enumerate(A.offsets):
        acc = acc + A.vals[w] * jax.lax.slice_in_dim(xp, lo + o,
                                                     lo + o + A.n_rows)
    return acc


def dia_spmv_df(A: DiaMatrix, x) -> "DF":
    """Double-float y = A @ x: A.vals and x are DF pairs (ops/precision).
    Same static-slice structure as dia_spmv, with error-free-transform
    multiply-adds — the TPU-native stand-in for the reference's all-f64
    kernel (mult, matrix.c:498-516).

    Accumulates with df_fma (~27 flops/term, one deferred compensation)
    rather than df_add(df_mul(...)) (~45): the round-4 corrected roofline
    showed this kernel VPU-BOUND, not HBM-bound — the old chain measured
    48 Gnnz/s = 435 GB/s implied vs ~740 GB/s achievable, so flops were
    the wall. df_fma is the same arithmetic the fused Pallas iterations
    use in-kernel (pallas_fused_pipe_df2._spmv, error ~2^-48 relative
    per term), keeping the two paths' rounding aligned. Still one fused
    elementwise pass over the val streams — a round-2 rewrite that
    pre-split the iterate materialized two extra full-length arrays and
    ran 2.5x SLOWER (17.2 Gnnz/s); bytes still matter most after flops."""
    from mpi_bicgstab_tpu.ops.precision import DF, df_fma, df_zeros
    lo, hi = A.pad
    xp = DF(jnp.pad(x.hi, (lo, hi)), jnp.pad(x.lo, (lo, hi)))
    acc = df_zeros((A.n_rows,), x.hi.dtype)
    for w, o in enumerate(A.offsets):
        seg = DF(jax.lax.slice_in_dim(xp.hi, lo + o, lo + o + A.n_rows),
                 jax.lax.slice_in_dim(xp.lo, lo + o, lo + o + A.n_rows))
        acc = df_fma(acc, A.vals[w], seg)
    return acc


def dia_to_dense(A: DiaMatrix) -> np.ndarray:
    vals = np.asarray(A.vals)
    d = np.zeros((A.n_rows, A.n_cols), vals.dtype)
    i = np.arange(A.n_rows)
    for w, o in enumerate(A.offsets):
        m = (i + o >= 0) & (i + o < A.n_cols)
        d[i[m], i[m] + o] = vals[w, m]
    return d
