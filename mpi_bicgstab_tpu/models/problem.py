"""Problem construction mirroring the reference drivers.

Every reference driver builds the RHS so the exact solution is all-ones:
b = A*1 (main.c:109-117) or b = (A + sigma_seed*I)*1 (main_shifted.c:109-114),
with x0 = 0. That gives a free ground-truth check: ||x - 1|| at the end.

Padding: TPU shapes want n divisible by the mesh size (and ideally by
8*128 for Pallas tiles). pad_csr_identity extends A with identity rows
(A_pad[i,i] = 1 for i >= n); padded RHS entries are 0 so the padded
solution components are exactly 0 and never perturb dots or residuals.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpi_bicgstab_tpu.ops.sparse import CSRMatrix


def pad_csr_identity(csr: CSRMatrix, multiple: int) -> CSRMatrix:
    """Pad a square CSR to ceil(n/multiple)*multiple rows/cols with 1.0
    identity rows. Returns csr unchanged if already aligned."""
    n = csr.nrows
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return csr
    extra = n_pad - n
    ptr = np.concatenate([csr.ptr,
                          csr.ptr[-1] + 1 + np.arange(extra, dtype=np.int64)])
    col = np.concatenate([csr.col, np.arange(n, n_pad, dtype=np.int64)])
    val = np.concatenate([csr.val, np.ones(extra, dtype=csr.val.dtype)])
    return CSRMatrix(ptr, col, val, (n_pad, n_pad))


@dataclasses.dataclass
class Problem:
    """A ready-to-solve system: device operator + RHS with known solution."""

    csr: CSRMatrix          # padded host CSR (oracle / repartition source)
    A: object               # device operator (DiaMatrix / EllMatrix / HybridMatrix)
    b: jax.Array            # RHS, [n_pad]
    x0: jax.Array           # zeros, [n_pad]
    n_logical: int          # rows before padding
    sigma_seed: float = 0.0
    perm: np.ndarray | None = None   # RCM permutation (ops/reorder.py)

    @property
    def n(self) -> int:
        return self.csr.nrows

    def exact_solution(self) -> np.ndarray:
        # all-ones is permutation invariant, so this holds under RCM too
        e = np.zeros(self.n)
        e[: self.n_logical] = 1.0
        return e

    def unpermute(self, x_host: np.ndarray) -> np.ndarray:
        """Map a solution of the (possibly reordered) system back to the
        original row ordering (identity when no reorder was applied)."""
        if self.perm is None:
            return np.asarray(x_host)
        from mpi_bicgstab_tpu.ops.reorder import unpermute_vector
        x = np.asarray(x_host)
        out = x.copy()
        out[..., : self.perm.size] = unpermute_vector(
            x[..., : self.perm.size].T, self.perm).T
        return out


def build_problem(csr: CSRMatrix, dtype=jnp.float64, multiple: int = 8,
                  sigma_seed: float = 0.0, ell_width: int | None = None,
                  format: str = "auto", reorder: str = "none",
                  layout_cache: str | None = None) -> Problem:
    """b = (A + sigma_seed I) * ones (ones over the logical rows only);
    computed on host in float64 for accuracy, then cast to dtype.
    format selects the device layout (ops/layout.py): 'auto' routes to
    DIA / hybrid / ELL by diagonal-structure analysis.

    dtype='df32' builds the double-float extended-precision problem
    (ops/precision): operator vals, b, and x0 become DF pairs giving
    ~2^-49 unit roundoff on f32-only TPU hardware.

    reorder: 'none' | 'rcm' | 'auto' — bandwidth-reducing RCM
    permutation (ops/reorder.py) applied BEFORE layout analysis;
    'auto' reorders only when it moves the matrix onto the DIA fast
    path. The returned Problem carries the permutation for
    unpermute().

    layout_cache: directory for the persistent operator cache
    (utils/opcache.py) — repeat builds of the same matrix + options
    load the serialized layout instead of re-running the host
    construction (butterfly routing, window assignment, DIA scan)."""
    from mpi_bicgstab_tpu.ops.layout import build_operator
    from mpi_bicgstab_tpu.ops.reorder import maybe_reorder

    csr, perm = maybe_reorder(csr, reorder)
    n_logical = csr.nrows
    csr_p = pad_csr_identity(csr, multiple)
    ones = np.zeros(csr_p.nrows)
    ones[:n_logical] = 1.0
    b_host = csr_p.matvec(ones) + sigma_seed * ones
    b_host[n_logical:] = 0.0  # identity-row RHS: padded solution is 0
    if dtype == "df32":
        from mpi_bicgstab_tpu.ops.precision import df_from_f64, df_zeros_like
        A = build_operator(csr_p, format=format, dtype="df32",
                           ell_width=ell_width, cache_dir=layout_cache)
        b = df_from_f64(b_host)
        x0 = df_zeros_like(b)
    else:
        A = build_operator(csr_p, format=format, dtype=np.dtype(dtype),
                           ell_width=ell_width, cache_dir=layout_cache)
        b = jnp.asarray(b_host, dtype=dtype)
        x0 = jnp.zeros_like(b)
    return Problem(csr_p, A, b, x0, n_logical, sigma_seed, perm)
