"""Device-operator builder: picks the TPU layout for a host CSR matrix.

    build_operator(csr, format='auto') ->
        DiaMatrix            (fully diagonal-structured)
        HybridMatrix         (DIA majority + ELL stragglers)
        EllMatrix            (unstructured)

and the generic `spmv(op, x)` each solver uses. See ops/dia.py for the
measured performance rationale.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpi_bicgstab_tpu.ops.dia import (DiaMatrix, analyze_diagonals,
                                      csr_to_dia, dia_spmv)
from mpi_bicgstab_tpu.ops.ell import EllMatrix, csr_to_ell
from mpi_bicgstab_tpu.ops.spmv import ell_spmv


@partial(jax.tree_util.register_dataclass,
         data_fields=["dia", "ell"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class HybridMatrix:
    """DIA part + ELL remainder; A = dia + ell."""

    dia: DiaMatrix
    ell: EllMatrix

    @property
    def shape(self):
        return self.dia.shape

    @property
    def n_rows(self):
        return self.dia.n_rows

    @property
    def n_cols(self):
        return self.dia.n_cols

    @property
    def dtype(self):
        return self.dia.dtype


def build_operator(csr, format: str = "auto", dtype=None,
                   max_diags: int = 64, dia_min_fill: float = 0.02,
                   ell_width: int | None = None,
                   cache_dir: str | None = None):
    """Pick and build the device layout for a square CSR matrix.

    cache_dir: directory for the persistent layout cache
    (utils/opcache.py) — keyed by a content hash of the CSR plus every
    option here, so repeat solves of the same matrix skip the host
    build (butterfly routing alone is ~27 s at Transport scale).

    format:
      'auto'   — DIA if the top diagonals cover everything, hybrid if
                 they cover >= 50%; else windowed-ELL when the matrix
                 has column locality (>= 95% of nnz inside per-row-tile
                 1024-col windows; f32/f64/df32); else butterfly-routed
                 (ops/butterfly.py — locality-free matrices, f32/f64);
                 else gather-ELL
      'dia'    — force DIA (+ ELL tail if any remainder)
      'window' — force windowed-ELL (ops/window_ell.py)
      'butterfly' — force the butterfly-routed layout
      'ell'    — force gather-ELL (the faithful-to-reference layout;
                 slow on TPU, useful for A/B benchmarking)
    """
    if format not in ("auto", "dia", "ell", "hybrid", "window",
                      "butterfly"):
        raise ValueError(f"unknown format {format!r}")
    if cache_dir is None:
        # MBT_LAYOUT_CACHE provides a process-wide default so paths
        # that don't thread the parameter (bench helpers, scripts)
        # still benefit; '0'/'off' disables
        import os
        cache_dir = os.environ.get("MBT_LAYOUT_CACHE") or "off"
    if cache_dir.lower() not in ("0", "off"):
        from mpi_bicgstab_tpu.utils import opcache
        dtype_tag = "df32" if dtype == "df32" else str(np.dtype(
            dtype if dtype is not None else csr.val.dtype))
        key = opcache.operator_key(
            csr, format=format, dtype=dtype_tag, max_diags=max_diags,
            dia_min_fill=dia_min_fill, ell_width=ell_width)
        op = opcache.load_operator(cache_dir, key)
        if op is not None:
            return op
        op = build_operator(csr, format=format, dtype=dtype,
                            max_diags=max_diags,
                            dia_min_fill=dia_min_fill,
                            ell_width=ell_width, cache_dir="off")
        opcache.save_operator(cache_dir, key, op)
        return op
    if format == "ell":
        return csr_to_ell(csr, width=ell_width, dtype=dtype)
    if format == "window":
        from mpi_bicgstab_tpu.ops.window_ell import csr_to_window_ell
        return csr_to_window_ell(csr, dtype=dtype)
    if format == "butterfly":
        from mpi_bicgstab_tpu.ops.butterfly import build_butterfly
        return build_butterfly(csr, dtype=dtype)

    offsets, coverage = analyze_diagonals(csr, max_diags=max_diags,
                                          min_fill=dia_min_fill)
    if format == "auto" and (not offsets or coverage < 0.5):
        if csr.nrows % 1024 == 0:
            from mpi_bicgstab_tpu.ops.window_ell import (
                csr_to_window_ell, window_ell_stats)
            stats = window_ell_stats(csr)
            if stats["window_frac"] >= 0.95:
                try:
                    return csr_to_window_ell(csr, dtype=dtype)
                except ValueError:
                    pass    # hub rows overflow the tail levels
        # locality-free fast path: butterfly routing (the build is
        # ~30 s at 1.6M with the native router — amortized over a
        # solver's thousands of SpMVs); f32 and df32 variants
        from mpi_bicgstab_tpu.ops.butterfly import build_butterfly
        try:
            return build_butterfly(csr, dtype=dtype)
        except ValueError:
            pass            # not routable: dense blocks / wide rows
        return csr_to_ell(csr, width=ell_width, dtype=dtype)

    dia, remainder = csr_to_dia(csr, offsets, dtype=dtype)
    if remainder is None:
        return dia
    ell = csr_to_ell(remainder, width=ell_width, dtype=dtype)
    return HybridMatrix(dia, ell)


def spmv(op, x):
    """Generic y = op @ x over any device layout (f32/f64 arrays or
    double-float DF pairs — the layout carries DF vals iff built with
    dtype='df32')."""
    from mpi_bicgstab_tpu.ops.precision import df_add, is_df
    from mpi_bicgstab_tpu.ops.cheby import ChebyOperator, precond_spmv
    if isinstance(op, ChebyOperator):
        # right-preconditioned multiply: y = A p(A) x (ops/cheby.py)
        return precond_spmv(op, x)
    if isinstance(op, DiaMatrix):
        if is_df(op.vals):
            from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
            return dia_spmv_df(op, x)
        from mpi_bicgstab_tpu.ops import pallas_spmv
        if pallas_spmv.use_pallas_for(op):
            return pallas_spmv.dia_spmv_pallas(op, x)
        return dia_spmv(op, x)
    if isinstance(op, EllMatrix):
        if is_df(op.vals):
            from mpi_bicgstab_tpu.ops.spmv import ell_spmv_df
            return ell_spmv_df(op, x)
        return ell_spmv(op, x)
    from mpi_bicgstab_tpu.ops.window_ell import WindowEllMatrix
    if isinstance(op, WindowEllMatrix):
        from mpi_bicgstab_tpu.ops.pallas_window_spmv import (
            window_spmv, window_spmv_df)
        interp = jax.default_backend() == "cpu"
        if is_df(op.vals):
            return window_spmv_df(op, x, interpret=interp)
        return window_spmv(op, x, interpret=interp)
    from mpi_bicgstab_tpu.ops.butterfly import ButterflyMatrix
    if isinstance(op, ButterflyMatrix):
        from mpi_bicgstab_tpu.ops import pallas_butterfly as pbf
        from mpi_bicgstab_tpu.ops.butterfly import (butterfly_spmv_xla,
                                                    butterfly_spmv_xla_df)
        if is_df(op.k3_vals):
            from mpi_bicgstab_tpu.ops.precision import DF
            if pbf.available_df(op, op.dtype):
                y = pbf.butterfly_spmv_df(op, x)
            else:
                y = butterfly_spmv_xla_df(op, x)
            return DF(y.hi[: op.n_rows], y.lo[: op.n_rows])
        if pbf.available(op, op.dtype):
            y = pbf.butterfly_spmv(op, x)
        else:
            y = butterfly_spmv_xla(op, x)
        return y[: op.n_rows]
    if isinstance(op, HybridMatrix):
        if is_df(op.dia.vals):
            from mpi_bicgstab_tpu.ops.dia import dia_spmv_df
            from mpi_bicgstab_tpu.ops.spmv import ell_spmv_df
            return df_add(dia_spmv_df(op.dia, x), ell_spmv_df(op.ell, x))
        return dia_spmv(op.dia, x) + ell_spmv(op.ell, x)
    raise TypeError(f"not a device sparse operator: {type(op)}")
