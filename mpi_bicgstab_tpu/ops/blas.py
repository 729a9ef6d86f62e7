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


def dot(u, v):
    """Local (single-shard) dot product, reference my_ddot vector.c:10-16."""
    return jnp.dot(u, v, precision="highest")


def dots(*pairs):
    """Stack several dot products into one length-k reduction vector."""
    return jnp.stack([dot(u, v) for u, v in pairs])


def axpy(alpha, x, y):
    """y + alpha*x, reference my_daxpy vector.c:3-8."""
    return y + alpha * x
