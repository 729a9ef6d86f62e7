"""Structure sweep: every matrix shape class through the auto layout
router, generic spmv vs the float64 host matvec, in f64 and df32.

Guards the dispatch matrix (DIA / hybrid / ELL / windowed-ELL /
butterfly, x {plain, DF}) as a single regression net: a new layout or
a routing change must keep every class correct.
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from mpi_bicgstab_tpu.models.generators import (banded_random,  # noqa: E402
                                                clustered_random,
                                                poisson2d,
                                                random_diag_dominant)
from mpi_bicgstab_tpu.ops.layout import build_operator, spmv  # noqa: E402
from mpi_bicgstab_tpu.ops.precision import (df_from_f64,  # noqa: E402
                                            df_to_f64)


def _hub_matrix(n=2048, seed=4):
    """Mostly banded with a few dense 'hub' rows — exercises tails."""
    csr = banded_random(n, [1, -1, 30, -30], seed=seed)
    import numpy as np
    from mpi_bicgstab_tpu.ops.sparse import CSRMatrix
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    ptr = np.asarray(csr.ptr)
    for r in range(n):
        cs = np.asarray(csr.col[ptr[r]:ptr[r + 1]])
        vs = np.asarray(csr.val[ptr[r]:ptr[r + 1]])
        rows += [r] * cs.size
        cols += list(cs)
        vals += list(vs)
    for hub in rng.choice(n, 3, replace=False):
        extra = rng.choice(n, 60, replace=False)
        rows += [int(hub)] * extra.size
        cols += list(extra)
        vals += list(rng.standard_normal(extra.size) * 0.01)
    import numpy as _np
    order = _np.lexsort((_np.asarray(cols), _np.asarray(rows)))
    rows = _np.asarray(rows)[order]
    cols = _np.asarray(cols)[order]
    vals = _np.asarray(vals)[order]
    # drop duplicate (r,c): keep first
    key = rows.astype(_np.int64) * n + cols
    keep = _np.r_[True, key[1:] != key[:-1]]
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    counts = _np.bincount(rows, minlength=n)
    ptr2 = _np.r_[0, _np.cumsum(counts)]
    return CSRMatrix(ptr2.astype(_np.int64), cols.astype(_np.int64),
                     vals.astype(_np.float64), (n, n))


CASES = [
    ("banded", lambda: banded_random(1536, [1, -1, 12, -12], seed=0)),
    ("poisson2d", lambda: poisson2d(40)),
    ("wide_band", lambda: banded_random(4096, [1, -1, 700, -700],
                                        seed=1)),
    ("clustered", lambda: clustered_random(2048, seed=2)),
    ("uniform_random", lambda: random_diag_dominant(3072, nnz_per_row=5,
                                                    seed=3)),
    ("hub_rows", _hub_matrix),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_auto_layout_spmv_f64(name, gen):
    csr = gen()
    op = build_operator(csr, format="auto")
    x = np.random.default_rng(7).standard_normal(csr.nrows)
    y = np.asarray(spmv(op, np.asarray(x)))[: csr.nrows]
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / max(np.abs(yr).max(), 1e-300)
    assert rel < 1e-12, (name, type(op).__name__, rel)


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_auto_layout_spmv_df32(name, gen):
    csr = gen()
    op = build_operator(csr, format="auto", dtype="df32")
    x = np.random.default_rng(8).standard_normal(csr.nrows)
    y = df_to_f64(spmv(op, df_from_f64(x)))[: csr.nrows]
    yr = csr.matvec(x)
    rel = np.abs(y - yr).max() / max(np.abs(yr).max(), 1e-300)
    assert rel < 1e-10, (name, type(op).__name__, rel)


def test_clustered_window_width_pinned():
    """Auto-selection on the clustered profile must keep producing the
    windowed-ELL layout at width 24 with exact tail counts — the
    round-3 bench-of-record collapse (15.5 -> 4.3 Gnnz/s) was a TAIL
    regression at unchanged width, and this pins both knobs so a
    future drift shows up as a test failure, not a silent headline
    change (VERDICT r3 next-round #2)."""
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.models.generators import clustered_random
    from mpi_bicgstab_tpu.ops.layout import build_operator
    from mpi_bicgstab_tpu.ops.window_ell import WindowEllMatrix

    csr = clustered_random(51200)
    A = build_operator(csr, format="auto", dtype=jnp.float32,
                       cache_dir="off")
    assert isinstance(A, WindowEllMatrix)
    assert A.width == 24
    assert A.tail_counts and sum(A.tail_counts) > 0
    # padding ratio the tail fix removed from the scatter path: the
    # rectangle is >= 2x the real entries on this profile
    cap_total = A.tail_rows.shape[0] * A.tail_rows.shape[1]
    assert cap_total >= 2 * sum(A.tail_counts)
