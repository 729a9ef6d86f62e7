"""Test / benchmark matrix generators.

The reference ships no matrices (data/ is .gitignore'd) and benchmarks on
SuiteSparse Transport.mtx (1,602,111 rows, 23,487,281 nnz, ~14.7 nnz/row,
real unsymmetric values on a structurally symmetric pattern —
README.md:32-42). With zero network egress we synthesize matrices with
matching profiles instead:

* poisson2d / poisson3d — classic stencils, well-conditioned, for
  convergence tests with known iteration behavior.
* banded_random / transport_like — fixed diagonal structure with random
  unsymmetric values and a dominant main diagonal; transport_like matches
  Transport's size/density profile for the benchmark.
"""
from __future__ import annotations

import numpy as np

from mpi_bicgstab_tpu.ops.sparse import COOMatrix, CSRMatrix, coo_to_csr


def _dia_to_csr(n: int, offsets, diag_vals) -> CSRMatrix:
    """Assemble a square matrix from (offset, values) diagonals.

    Direct CSR assembly: for unique offsets the CSR structure is analytic
    (row i holds offsets o with 0 <= i+o < n, in offset order), so no COO
    staging or sort is needed — this keeps 24M-nnz benchmark matrices
    around a second instead of minutes of lexsort."""
    order = np.argsort(offsets, kind="stable")
    offs = np.asarray(offsets, dtype=np.int64)[order]
    if offs.size and (np.diff(offs) == 0).any():
        # duplicate offsets: fall back to the general COO path
        rows_l, cols_l, vals_l = [], [], []
        for off, dv in zip(offsets, diag_vals):
            r = (np.arange(0, n - off, dtype=np.int64) if off >= 0
                 else np.arange(-off, n, dtype=np.int64))
            rows_l.append(r)
            cols_l.append(r + off)
            v = dv if np.ndim(dv) else np.full(r.size, dv)
            vals_l.append(np.asarray(v, dtype=np.float64)[: r.size])
        coo = COOMatrix(np.concatenate(rows_l), np.concatenate(cols_l),
                        np.concatenate(vals_l), (n, n))
        return coo_to_csr(coo, sum_duplicates=True)

    dvals = [diag_vals[k] for k in order]
    rows = np.arange(n, dtype=np.int64)
    # offsets invalid at row i: o < -i (a prefix of offs) or o > n-1-i
    # (a suffix) — counts via searchsorted over the sorted offsets
    n_lo = np.searchsorted(offs, -rows, side="left")
    n_hi = offs.size - np.searchsorted(offs, n - 1 - rows, side="right")
    lengths = offs.size - n_lo - n_hi
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=ptr[1:])
    nnz = int(ptr[-1])
    col = np.empty(nnz, dtype=np.int64)
    val = np.empty(nnz, dtype=np.float64)
    for w, (o, dv) in enumerate(zip(offs.tolist(), dvals)):
        r = (np.arange(0, n - o, dtype=np.int64) if o >= 0
             else np.arange(-o, n, dtype=np.int64))
        pos = ptr[r] + (w - n_lo[r])
        col[pos] = r + o
        v = dv if np.ndim(dv) else np.full(r.size, dv)
        val[pos] = np.asarray(v, dtype=np.float64)[: r.size]
    return CSRMatrix(ptr, col, val, (n, n))


def poisson2d(nx: int, ny: int | None = None) -> CSRMatrix:
    """5-point Laplacian on an nx x ny grid (SPD, 4 on diag)."""
    ny = ny or nx
    n = nx * ny
    main = np.full(n, 4.0)
    ew = -np.ones(n - 1)
    ew[np.arange(1, n) % nx == 0] = 0.0  # no wrap across grid rows
    ns = -np.ones(n - nx)
    return _dia_to_csr(n, [0, 1, -1, nx, -nx],
                       [main, ew, ew.copy(), ns, ns.copy()])


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None) -> CSRMatrix:
    """7-point Laplacian on an nx x ny x nz grid."""
    ny = ny or nx
    nz = nz or nx
    n = nx * ny * nz
    main = np.full(n, 6.0)
    ex = -np.ones(n - 1)
    ex[np.arange(1, n) % nx == 0] = 0.0
    ey = -np.ones(n - nx)
    ey[(np.arange(nx, n) // nx) % ny == 0] = 0.0
    ez = -np.ones(n - nx * ny)
    return _dia_to_csr(n, [0, 1, -1, nx, -nx, nx * ny, -nx * ny],
                       [main, ex, ex.copy(), ey, ey.copy(), ez, ez.copy()])


def banded_random(n: int, offsets, seed: int = 0,
                  diag_boost: float = 1.0) -> CSRMatrix:
    """Unsymmetric values on a fixed band structure; the main diagonal is
    set to diag_boost + (sum of |off-diagonals| in the row) so the matrix
    is strictly diagonally dominant — BiCGStab converges on it, like the
    transport matrices the reference targets."""
    rng = np.random.default_rng(seed)
    offsets = [int(o) for o in offsets]
    if 0 not in offsets:
        offsets = [0] + offsets
    diag_vals = []
    row_abs = np.zeros(n)
    entries = []
    for off in offsets:
        if off == 0:
            continue
        size = n - abs(off)
        v = rng.uniform(-1.0, 1.0, size)
        entries.append((off, v))
        if off > 0:  # rows [0, size) — contiguous, no scatter needed
            row_abs[:size] += np.abs(v)
        else:
            row_abs[-off:] += np.abs(v)
    main = diag_boost + row_abs
    offs = [0] + [o for o, _ in entries]
    vals = [main] + [v for _, v in entries]
    return _dia_to_csr(n, offs, vals)


def random_diag_dominant(n: int, nnz_per_row: int = 8, seed: int = 0) -> CSRMatrix:
    """Random sparsity pattern (not banded), strictly diagonally dominant."""
    rng = np.random.default_rng(seed)
    k = max(1, nnz_per_row - 1)
    cols = rng.integers(0, n, size=(n, k))
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    vals = rng.uniform(-1.0, 1.0, size=n * k)
    rows_all = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cols_all = np.concatenate([cols.ravel(), np.arange(n, dtype=np.int64)])
    row_abs = np.abs(vals).reshape(n, k).sum(axis=1)
    vals_all = np.concatenate([vals, 1.0 + row_abs])
    coo = COOMatrix(rows_all, cols_all, vals_all, (n, n))
    return coo_to_csr(coo, sum_duplicates=True)


def banded_tough(n: int, offsets, seed: int = 0,
                 dominance: float = 0.46) -> CSRMatrix:
    """Like banded_random but SUB-dominant: main diagonal is
    dominance * (row off-diagonal mass) + 0.05, so BiCGStab exhibits the
    reference's realistic long, erratic convergence (the diagonally
    dominant generators converge in ~20 iterations; the real Transport
    takes ~2,600-4,000, README.md:45). Around dominance 0.45-0.5 the
    iteration count sweeps ~80 to ~6,000 (measured at n=40k)."""
    rng = np.random.default_rng(seed)
    offsets = [int(o) for o in offsets if o != 0]
    entries = []
    row_abs = np.zeros(n)
    for off in offsets:
        size = n - abs(off)
        v = rng.uniform(-1.0, 1.0, size)
        entries.append((off, v))
        if off > 0:
            row_abs[:size] += np.abs(v)
        else:
            row_abs[-off:] += np.abs(v)
    main = dominance * row_abs + 0.05
    offs = [0] + [o for o, _ in entries]
    vals = [main] + [v for _, v in entries]
    return _dia_to_csr(n, offs, vals)


def transport_hard(n: int = 1_602_112, seed: int = 0,
                   gamma: float = 0.9, theta: float = 25.0,
                   conv: tuple = (0.6, 0.3, 0.15),
                   skew: float = 0.2,
                   rot: tuple = (0.0, 0.0, 0.0)) -> CSRMatrix:
    """Convergence-realistic Transport-profile benchmark: BiCGStab needs
    THOUSANDS of iterations (the reference's regime — ~2,600-4,000 on
    Transport.mtx, README.md:44-51 / doc/residual_result.png), yet the
    symmetric part is provably positive definite so there is no
    breakdown, only slow Krylov convergence.

    Construction (all spectra analytic, so difficulty is a dial):
      * per axis, the 1-D operator T1 = K + theta*K^2 with
        K = tridiag(-1,2,-1) (Dirichlet): a 5-band matrix POLYNOMIAL in
        K, so its eigenvectors are K's sine modes exactly and
        mu_j = kappa_j + theta*kappa_j^2, kappa_j = 4 sin^2(j pi/(2(m+1))).
      * 3-D Kronecker sum of the three T1's -> 13-diagonal stencil
        (~13 nnz/row vs Transport's ~14.7), lambda_min = 3*mu_1.
      * upwind convection `conv` per axis (unsymmetric, PSD symmetric
        part) + a random SKEW-symmetric perturbation of amplitude `skew`
        on the +/-1 pairs (changes the Krylov behavior per `seed`,
        leaves the symmetric part bit-identical).
      * CENTERED convection `rot` per axis: a constant (+r, -r)
        skew-symmetric pair — tridiag(-r, d, +r) has eigenvalues
        d + 2ir cos(theta) with a unimodular diagonal similarity, so
        `rot` dials a PURELY IMAGINARY spectral spread of +/-2r per
        axis without touching the symmetric part. Large imaginary
        parts are exactly what BiCGStab's real degree-1 stabilizer
        handles worst (the reason BiCGStab(l) exists) — this is the
        convection-dominated difficulty of the real Transport operator.
      * diagonal shift -gamma*lambda_min narrows the spectral gap.

    The ITERATION dial is `theta`: the bulk condition number is
    kappa ~ (4 + 16*theta) / (kappa_1 (1 + theta*kappa_1)) per axis
    (biharmonic-dominated for large theta, i.e. kappa ~ kappa(K)^2)
    and BiCGStab needs ~sqrt(kappa) iterations. Because the difficulty
    is the WHOLE bulk spectrum — not an isolated near-null mode — the
    drivers' b = A*ones construction cannot suppress it, and
    convergence is slow but breakdown-free. Measured on the chip (df32,
    tol 1e-12, classic bicgstab): at 200k rows theta 10/50/150 ->
    1036/2300/5726 iterations; at 1.6M rows theta=25 -> 2522 — the
    reference's Transport regime (~2,600-4,000, README.md:44-51).
    gamma (<1) mildly narrows the gap; gamma>1 flips modes negative
    (indefinite) where BiCGStab breaks down (measured — avoid); large
    `rot` likewise breaks the real-omega stabilizer.

    Returns an m^3-row matrix with m = round(n^(1/3))."""
    m = int(round(n ** (1 / 3)))
    if m < 5:
        raise ValueError("transport_hard needs n >= 125")
    N = m * m * m
    w = m
    alpha = 1.0
    rng = np.random.default_rng(seed)
    idx = np.arange(N, dtype=np.int64)
    x = idx % w
    y = (idx // w) % w
    z = idx // (w * w)
    kap1 = 4.0 * np.sin(np.pi / (2.0 * (m + 1))) ** 2
    cx, cy, cz = conv
    # exact lambda_min of sym(A)+shift: upwind convection's symmetric
    # part is (c/2)K per axis exactly (diag c everywhere + tridiag
    # (1,0,1)/2), so sym(A) = sum_d [(alpha + c_d/2) K + theta K^2]
    lam_min = (3.0 * alpha + 0.5 * (cx + cy + cz)) * kap1 \
        + 3.0 * theta * kap1 * kap1
    # main diagonal: per-axis 2a+6t interior / 2a+5t at the two ends,
    # + upwind convection, - the spectral-gap shift
    diag = np.zeros(N)
    for pos in (x, y, z):
        diag += 2 * alpha + 6 * theta \
            - theta * ((pos == 0) | (pos == w - 1))
    diag += cx + cy + cz - gamma * lam_min

    offs, vals = [0], [diag]
    off1 = -(alpha + 4 * theta)
    rx, ry, rz = rot
    for pos, step, c, r in ((x, 1, cx, rx), (y, w, cy, ry),
                            (z, w * w, cz, rz)):
        e = skew * rng.uniform(-1.0, 1.0, N - step) + r
        # +step: element j <-> entry (j, j+step); valid pos[j] < w-1
        up_ok = pos[: N - step] < w - 1
        vals.append(np.where(up_ok, off1 + e, 0.0))
        offs.append(step)
        # -step: element j <-> entry (j+step, j); upwind side gets -c
        vals.append(np.where(up_ok, off1 - c - e, 0.0))
        offs.append(-step)
        # +/-2*step: the theta*K^2 outer band, valid pos within 2
        up2 = pos[: N - 2 * step] < w - 2
        vals.append(np.where(up2, theta, 0.0))
        offs.append(2 * step)
        vals.append(np.where(up2, theta, 0.0))
        offs.append(-2 * step)
    return _dia_to_csr(N, offs, vals)


def transport_like(n: int = 1_602_112, seed: int = 0) -> CSRMatrix:
    """Benchmark matrix profiled on SuiteSparse Transport (the reference's
    headline benchmark, README.md:29): ~1.6M rows, ~14.7 nnz/row as a
    15-diagonal band (structurally symmetric offsets, unsymmetric values),
    diagonally dominant. nnz ~= 15*n - O(band) ~= 24M at the default n."""
    w = int(round(n ** (1 / 3)))
    offsets = [1, -1, 2, -2, w, -w, w + 1, -(w + 1), w * w, -(w * w),
               w * w + w, -(w * w + w), w * w + w + 1, -(w * w + w + 1)]
    offsets = [o for o in offsets if abs(o) < n]
    return banded_random(n, offsets, seed=seed, diag_boost=1.0)


def clustered_random(n: int, nnz_per_row: int = 8, seed: int = 0,
                     global_frac: float = 0.003) -> CSRMatrix:
    """Unstructured-but-CLUSTERED sparsity: each 1024-row block draws
    its columns uniformly at random WITHIN its own 1024-column block,
    plus a `global_frac` fraction of long-range entries anywhere —
    the sparsity profile of partitioned FEM meshes / community graphs.

    NOT bandable: within a block the pattern is uniform random over
    ~1024 distinct "diagonals", so no permutation exposes a DIA
    structure (RCM included) — yet ops/window_ell.py captures >=99% of
    nnz in per-tile windows. This is the benchmark matrix for the
    windowed-ELL unstructured fast path; diagonally dominant so the
    solvers converge on it. n must be a multiple of 1024."""
    if n % 1024:
        raise ValueError("clustered_random needs n % 1024 == 0")
    rng = np.random.default_rng(seed)
    k = max(1, nnz_per_row - 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    block = rows // 1024
    local = rng.integers(0, 1024, size=n * k)
    cols = block * 1024 + local
    n_glob = int(global_frac * n * k)
    if n_glob:
        pick = rng.choice(n * k, size=n_glob, replace=False)
        cols[pick] = rng.integers(0, n, size=n_glob)
    vals = rng.uniform(-1.0, 1.0, size=n * k)
    rows_all = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cols_all = np.concatenate([cols, np.arange(n, dtype=np.int64)])
    row_abs = np.abs(vals).reshape(n, k).sum(axis=1)
    vals_all = np.concatenate([vals, 1.0 + row_abs])
    from mpi_bicgstab_tpu.ops.sparse import coo_to_csr
    coo = COOMatrix(rows_all, cols_all, vals_all, (n, n))
    return coo_to_csr(coo, sum_duplicates=True)


def skew_banded(n: int, w: int = 0, diag: float = 0.05,
                seed: int = 0) -> CSRMatrix:
    """Skew-dominant operator A = diag*I + S with S^T = -S on a +/-1,
    +/-w band: eigenvalues diag +/- i*s_k — a spectrum the classic
    BiCGStab family CANNOT handle (its stabilizer is a degree-1 REAL
    minimal-residual polynomial; omega collapses on conjugate pairs
    and the solve stagnates or diverges). The motivating fixture for
    BiCGStab(l) (solvers/bicgstab_l.py): l >= 2 fits a degree-l
    polynomial per cycle and converges. Models convection-dominated
    transport (central-difference convection >> diffusion), the
    standard real-world source of such spectra."""
    rng = np.random.default_rng(seed)
    w = w or max(2, int(round(n ** (1 / 3))))
    rows = [np.arange(n, dtype=np.int64)]
    cols = [np.arange(n, dtype=np.int64)]
    vals = [np.full(n, diag)]
    for off in (1, w):
        if off >= n:
            continue
        size = n - off
        v = rng.uniform(0.5, 1.5, size)
        i = np.arange(size, dtype=np.int64)
        rows += [i, i + off]
        cols += [i + off, i]
        vals += [v, -v]          # S[i, i+off] = v, S[i+off, i] = -v
    coo = COOMatrix(np.concatenate(rows), np.concatenate(cols),
                    np.concatenate(vals), (n, n))
    from mpi_bicgstab_tpu.ops.sparse import coo_to_csr
    return coo_to_csr(coo)
