"""Sigma-axis sharding: a SECOND mesh axis for the shift ladder.

The reference's only parallel axis is the row partition (SURVEY §2:
matrix.c:295-308); its shift axis is a purely local loop over
sigma_len * n_loc daxpy traffic (shifted_switching_solver.c:429-445).
On TPU the shift axis maps to a batched leading dimension, and SURVEY
§2 already notes it can be "sharded over a second mesh axis for very
large sigma_len". This module is that axis.

Why it matters at the flagship's own scale: at Transport size
(n = 1.6M) with sigma_len = 512, the [S, n] x_set/p_set state is
~6.6 GB in f32 and ~13 GB in df32 — df32 barely fits a single v5e's
16 GB HBM next to the archives and workspace, and larger ladders or
matrices don't fit at all. Sharding the ladder over a `sigma` mesh
axis divides both the HBM footprint AND the shift-update bandwidth
(the hot loop) by the group count, while leaving the seed iteration's
comm pattern untouched.

Design (what shards, what replicates):

  * the [S, n] slabs (x_set, p_set) shard P('sigma', 'rows') — each
    device holds [S/G, n/R];
  * EVERYTHING else replicates across the sigma axis: the [S] scalar
    recurrences (eta/zeta/pi/alpha/beta/stop), the [M+1, S] archives,
    the seed vectors (r, q, s, ...), and all dot products. They are
    tiny (KBs to a few MB) and keeping them replicated means the
    seed-switching logic — history rebase, per-shift stopping, worst-
    shift argmax — runs UNCHANGED and bit-identically on every group;
  * slab updates consume the LOCAL SLICE of the (mask-folded)
    coefficient vectors: `coeff()` below. Folding the active mask into
    the coefficients (inactive rows get a 0 increment / 1,0 affine
    identity) is the same transformation the fused df32 shift-update
    kernel already uses (ops/pallas_shift_update.py), so inactive rows
    are preserved bit-exactly;
  * the seed row lives on ONE sigma group; `take_row` broadcasts it
    with a single [n_loc] psum over the sigma axis per use (two per
    iteration — O(n/R) traffic vs the O(S n / (G R)) slab update, a
    few % for practical ladders).

Cross-group collectives this adds: the take_row psum(s), nothing else.
A seed SWITCH needs no extra comm at all — the rebase only touches
replicated state (solvers/switching.py do_switch reads no slab).

The trivial SigmaComm() (no axis) reproduces the unsharded code paths
exactly; solvers take `shift_comm=None` and behave as before.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mpi_bicgstab_tpu.ops.precision import DF, is_df, vwhere

SIGMA = "sigma"


class SigmaComm:
    """Shift-ladder axis helper (trivial when axis is None).

    All row indices taken/updated through this class are GLOBAL ladder
    indices (possibly traced, e.g. the switching solver's seed index);
    the class maps them to the local slab row and masks by ownership.
    S must divide evenly by `groups` (the driver validates and raises
    before tracing).
    """

    def __init__(self, axis: str | None = None, groups: int = 1):
        if (axis is None) != (groups == 1):
            raise ValueError("axis and groups must agree: axis=None "
                             "iff groups == 1")
        self.axis = axis
        self.groups = groups

    # -- geometry ---------------------------------------------------------
    def s_local(self, S: int) -> int:
        if S % self.groups:
            raise ValueError(
                f"sigma_len {S} not divisible by sigma groups "
                f"{self.groups}")
        return S // self.groups

    def _offset(self, S: int):
        """This group's first global ladder index (traced)."""
        if self.axis is None:
            return jnp.int32(0)
        return lax.axis_index(self.axis) * self.s_local(S)

    # -- replicated-[S] -> local-[S/G] ------------------------------------
    def loc(self, vec):
        """Local slice of a replicated [S] (or DF [S]) vector."""
        if self.axis is None:
            return vec
        S = vec.shape[0]
        off = self._offset(S)
        take = lambda a: lax.dynamic_slice_in_dim(  # noqa: E731
            a, off, self.s_local(S))
        if is_df(vec):
            return DF(take(vec.hi), take(vec.lo))
        return take(vec)

    def coeff(self, mask, c, fill=0.0):
        """Mask-folded local coefficient COLUMN [S_loc, 1] for slab
        updates: rows outside `mask` get `fill` (0 for increments, 1
        for the multiplicative term of affine replacements), exactly
        like the fused shift-update kernels fold their masks."""
        c = vwhere(mask, c, fill)
        return self.loc(c)[:, None]

    # -- global-index row access on [S_loc, n] slabs -----------------------
    def _local_row(self, S: int, gidx):
        s_loc = self.s_local(S)
        off = self._offset(S)
        lidx = jnp.clip(gidx - off, 0, s_loc - 1)
        own = (gidx >= off) & (gidx < off + s_loc)
        return lidx, own

    def take_row(self, slab, gidx, S: int):
        """slab[gidx] by GLOBAL ladder index -> replicated [n] row
        (one [n] psum over the sigma axis when sharded)."""
        if self.axis is None:
            return slab[gidx]
        lidx, own = self._local_row(S, gidx)
        row = vwhere(own, slab[lidx], 0.0)
        return jax.tree_util.tree_map(
            lambda a: lax.psum(a, self.axis), row)

    def row_set(self, slab, gidx, val, S: int):
        """slab.at[gidx].set(val) by global index (owner-masked)."""
        if self.axis is None:
            return slab.at[gidx].set(val)
        lidx, own = self._local_row(S, gidx)
        return slab.at[lidx].set(vwhere(own, val, slab[lidx]))

    def row_add(self, slab, gidx, val, S: int):
        """slab.at[gidx].add(val) by global index (owner-masked)."""
        if self.axis is None:
            return slab.at[gidx].add(val)
        lidx, own = self._local_row(S, gidx)
        return slab.at[lidx].add(vwhere(own, val, 0.0))


def as_shift_comm(shift_comm) -> SigmaComm:
    """None -> the trivial communicator (single sigma group)."""
    return shift_comm if shift_comm is not None else SigmaComm()
