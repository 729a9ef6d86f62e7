"""BLAS-1 layer (reference vector.c:3-26: my_daxpy / my_ddot / my_dscal /
my_dcopy).

In JAX these are jnp one-liners that XLA fuses into neighbouring ops, so
the interesting part is the *reduction* API: `dots` evaluates several dot
products as ONE stacked reduction, which under shard_map becomes a single
psum of a small vector — the TPU analogue of the CA variant batching its
MPI_Iallreduce rendezvous (reference solver.c:227-247).
"""
from __future__ import annotations

import jax.numpy as jnp

from mpi_bicgstab_tpu.ops.precision import df_dot, df_stack, is_df


def dot(u, v):
    """Local (single-shard) dot product, reference my_ddot vector.c:10-16.
    DF operands get the compensated double-float dot (ops/precision)."""
    if is_df(u) or is_df(v):
        return df_dot(u, v)
    return jnp.dot(u, v, precision="highest")


def dots(*pairs):
    """Stack several dot products into one length-k reduction vector."""
    vals = [dot(u, v) for u, v in pairs]
    if any(is_df(x) for x in vals):
        return df_stack(vals)
    return jnp.stack(vals)


def axpy(alpha, x, y):
    """y + alpha*x, reference my_daxpy vector.c:3-8."""
    return y + alpha * x
