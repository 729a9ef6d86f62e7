"""Single-device SpMV kernels over the ELL layout.

jnp reference implementation (XLA fuses the gather+FMA chain); the Pallas
kernel in ops/pallas_spmv.py is the hand-tuned path for large matrices.
Rebuilds the role of `mult` (reference matrix.c:498-516) — but returns a
fresh y instead of accumulating, removing the caller-must-zero contract
the reference depended on (matrix.c:434-436).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpi_bicgstab_tpu.ops.ell import EllMatrix


def ell_spmv(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x. x: [n_cols] -> y: [n_rows].

    width dense gathers + FMAs; the padded entries gather x[0] with a 0.0
    coefficient. The w-loop is unrolled at trace time (width is static).
    """
    acc = jnp.zeros((A.n_rows,), dtype=jnp.result_type(A.vals, x))
    for w in range(A.width):
        acc = acc + A.vals[w] * x[A.cols[w]]
    if A.tail_size:
        tail = A.tail_vals * x[A.tail_cols]
        acc = acc + jax.ops.segment_sum(tail, A.tail_rows,
                                        num_segments=A.n_rows)
    return acc


def ell_spmv_df(A: EllMatrix, x) -> "DF":
    """Double-float y = A @ x over the gather-ELL layout: A.vals and x
    are DF pairs (ops/precision). Gathers act on hi/lo independently;
    accumulation uses df_fma multiply-adds (the same ~27-flop fused form
    the solver bodies and dia_spmv_df use — the df_add(df_mul) chain is
    VPU-bound, see dia.dia_spmv_df). The COO tail segments the
    product's hi/lo parts separately (the tail is zero-padded and rare,
    so the uncompensated lo sum is below DF resolution in practice)."""
    from mpi_bicgstab_tpu.ops.precision import (DF, df_add, df_fma,
                                                df_mul, df_zeros)
    acc = df_zeros((A.n_rows,), x.hi.dtype)
    for w in range(A.width):
        xg = DF(x.hi[A.cols[w]], x.lo[A.cols[w]])
        acc = df_fma(acc, A.vals[w], xg)
    if A.tail_size:
        xg = DF(x.hi[A.tail_cols], x.lo[A.tail_cols])
        t = df_mul(A.tail_vals, xg)
        acc = df_add(acc, DF(
            jax.ops.segment_sum(t.hi, A.tail_rows, num_segments=A.n_rows),
            jax.ops.segment_sum(t.lo, A.tail_rows, num_segments=A.n_rows)))
    return acc


def ell_spmv_shifted(A: EllMatrix, x: jax.Array, sigma) -> jax.Array:
    """y = (A + sigma I) @ x — the shifted-system operator
    (reference: s <- A p then daxpy sigma p, shifted_solver.c:261-262).
    Requires square A with rows==cols locally (used on the full operator
    or the diagonal block plus identity handled by the caller)."""
    return ell_spmv(A, x) + sigma * x
