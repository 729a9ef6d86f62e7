"""Communicator abstraction: the TPU stand-in for the reference's MPI calls.

The reference's entire communication surface is (SURVEY §2):
  * MPI_Iallgatherv + Wait  — assemble the full iterate for the offd SpMV
  * MPI_Iallreduce(SUM)     — global dot products
Here those map to lax.all_gather / lax.psum over one mesh axis inside
shard_map. A Comm with axis=None degrades every collective to the
identity, so the *same solver code* runs single-device and distributed —
the reference needed no such trick because mpirun -np 1 gave it the
degenerate case for free.

Overlap note: the reference hand-schedules overlap via Iallreduce/Wait
placement (e.g. solver.c:363-385). Under XLA the psum/all_gather are
async collectives; the latency-hiding scheduler overlaps them with
adjacent compute, so the pipelined variants express *dependency* order
only and leave the scheduling to the compiler.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops import blas


class Comm:
    """Collectives over one named mesh axis (or none, single device).

    serialize=True is the reference's *_nooverlap mode: seq() inserts
    optimization barriers so collectives/dot batches must complete
    before the compute that would otherwise hide them — the A/B that
    measures what the XLA latency-hiding scheduler's overlap buys
    (reference shifted_switching_solver.c:611-1016)."""

    def __init__(self, axis: str | None = None, serialize: bool = False):
        self.axis = axis
        self.serialize = serialize

    def seq(self, *xs):
        """Identity by default; under serialize, ties all arguments into
        one optimization_barrier group so none can be reordered across
        the others (forcing a Wait where the reference placed one)."""
        if not self.serialize:
            return xs if len(xs) > 1 else xs[0]
        out = lax.optimization_barrier(xs)
        return out if len(xs) > 1 else out[0]

    # -- reductions -----------------------------------------------------
    def allreduce(self, x):
        """MPI_Iallreduce(SUM) equivalent (reference solver.c:79 etc.).
        DF pairs psum hi/lo leafwise, then renormalize (the P-term sum
        of los stays below DF resolution for practical mesh sizes)."""
        if self.axis is None:
            return x
        from mpi_bicgstab_tpu.ops.precision import df_renorm, is_df
        out = lax.psum(x, self.axis)
        return df_renorm(out) if is_df(out) else out

    def dot(self, u, v):
        """One global dot product."""
        return self.allreduce(blas.dot(u, v))

    def dots(self, *pairs):
        """Several global dot products as ONE stacked reduction — the
        batched-Iallreduce trick of CA-BiCGStab (solver.c:240-247)."""
        return self.allreduce(blas.dots(*pairs))

    def max(self, x):
        if self.axis is None:
            return x
        return lax.pmax(x, self.axis)

    # -- gathers ---------------------------------------------------------
    def allgather(self, x_loc):
        """MPI_Iallgatherv equivalent (reference matrix.c:432): assemble
        the full vector from per-shard slices. tiled=True concatenates
        along axis 0 — shards must be equal-sized (we pad to guarantee
        this; the reference instead gave the remainder rows to the first
        ranks, matrix.c:295-298). DF pairs gather leafwise."""
        if self.axis is None:
            return x_loc
        return jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, self.axis, tiled=True), x_loc)

    def axis_index(self):
        if self.axis is None:
            return jnp.int32(0)
        return lax.axis_index(self.axis)
