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


def ell_spmv_shifted(A: EllMatrix, x: jax.Array, sigma) -> jax.Array:
    """y = (A + sigma I) @ x — the shifted-system operator
    (reference: s <- A p then daxpy sigma p, shifted_solver.c:261-262).
    Requires square A with rows==cols locally (used on the full operator
    or the diagonal block plus identity handled by the caller)."""
    return ell_spmv(A, x) + sigma * x
