"""Matrix Market reader tests (reference component C1/C2), including the
behavioral fixes for the reference's loader quirks (SURVEY §5)."""
import io

import numpy as np
import pytest
import scipy.io
import scipy.sparse

from mpi_bicgstab_tpu.io.mmio import (read_banner, read_matrix_market,
                                      write_matrix_market)
from mpi_bicgstab_tpu.ops.sparse import COOMatrix, coo_to_csr, load_csr


def _mtx(text: str) -> io.BytesIO:
    return io.BytesIO(text.encode())


GENERAL = """%%MatrixMarket matrix coordinate real general
% a comment
3 3 5
1 1 2.0
1 2 -1.0
2 2 3.0
3 1 4.5
3 3 1.0
"""

PATTERN = """%%MatrixMarket matrix coordinate pattern general
3 3 3
1 1
2 3
3 2
"""

SYMMETRIC = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 1 0.5
3 3 4.0
"""


def test_banner_and_size():
    h = read_banner(_mtx(GENERAL))
    assert (h.object, h.format, h.field, h.symmetry) == (
        "matrix", "coordinate", "real", "general")
    assert (h.nrows, h.ncols, h.nnz) == (3, 3, 5)


def test_banner_rejects_garbage():
    with pytest.raises(ValueError):
        read_banner(_mtx("hello world\n1 1 1\n"))


def test_read_general():
    rows, cols, vals, shape = read_matrix_market(_mtx(GENERAL))
    dense = COOMatrix(rows, cols, vals, shape).to_dense()
    expect = np.array([[2, -1, 0], [0, 3, 0], [4.5, 0, 1]])
    np.testing.assert_allclose(dense, expect)


def test_pattern_vals_are_one():
    # the reference's DISTRIBUTED loader read uninitialized vals for
    # pattern files (matrix.c:316-320 vs 68-73) — we always set 1.0
    rows, cols, vals, shape = read_matrix_market(_mtx(PATTERN))
    np.testing.assert_allclose(vals, 1.0)


def test_symmetric_expansion():
    rows, cols, vals, shape = read_matrix_market(_mtx(SYMMETRIC))
    dense = COOMatrix(rows, cols, vals, shape).to_dense()
    np.testing.assert_allclose(dense, dense.T)
    np.testing.assert_allclose(np.diag(dense), [2.0, 0.0, 4.0])


def test_symmetric_rejected_when_not_expanding():
    with pytest.raises(ValueError, match="symmetric"):
        read_matrix_market(_mtx(SYMMETRIC), expand_symmetric=False)


def test_roundtrip_against_scipy(tmp_path):
    rng = np.random.default_rng(0)
    m = scipy.sparse.random(40, 40, density=0.1, random_state=rng,
                            format="coo")
    p = tmp_path / "m.mtx"
    scipy.io.mmwrite(p, m)
    rows, cols, vals, shape = read_matrix_market(p)
    ours = COOMatrix(rows, cols, vals, shape).to_dense()
    np.testing.assert_allclose(ours, m.toarray(), rtol=1e-13)


def test_write_then_scipy_reads(tmp_path):
    rows = np.array([0, 1, 2])
    cols = np.array([2, 0, 1])
    vals = np.array([1.5, -2.25, 3.0])
    p = tmp_path / "w.mtx"
    write_matrix_market(p, rows, cols, vals, (3, 3), comment="test")
    back = scipy.io.mmread(p).toarray()
    np.testing.assert_allclose(back,
                               COOMatrix(rows, cols, vals, (3, 3)).to_dense())


def test_load_csr(tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(GENERAL)
    csr = load_csr(p)
    np.testing.assert_allclose(
        csr.to_dense(), np.array([[2, -1, 0], [0, 3, 0], [4.5, 0, 1]]))


def test_gzip(tmp_path):
    import gzip
    p = tmp_path / "g.mtx.gz"
    with gzip.open(p, "wb") as f:
        f.write(GENERAL.encode())
    rows, cols, vals, shape = read_matrix_market(p)
    assert shape == (3, 3) and len(vals) == 5
