"""Persistent layout cache (utils/opcache.py): a cached operator must
be indistinguishable from a freshly built one — same class, same SpMV
results bit-for-bit — and the key must change whenever the matrix
content or any build option changes (a stale hit must be impossible).
"""
import numpy as np
import pytest

from mpi_bicgstab_tpu.models.generators import (banded_random,
                                                clustered_random,
                                                random_diag_dominant)
from mpi_bicgstab_tpu.ops.layout import build_operator, spmv
from mpi_bicgstab_tpu.utils import opcache


def _spmv_host(op, x):
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.ops.precision import is_df
    y = spmv(op, x)
    if is_df(y):
        return np.asarray(y.hi, np.float64) + np.asarray(y.lo,
                                                         np.float64)
    return np.asarray(y)


CASES = [
    # (builder, format, dtype) — one per layout class
    (lambda: banded_random(1024, [1, -1, 9, -9], seed=0), "dia",
     np.float32),
    (lambda: banded_random(1024, [1, -1, 9, -9, 200], seed=1), "auto",
     np.float32),                                   # hybrid (straggler)
    (lambda: random_diag_dominant(512, nnz_per_row=6, seed=0), "ell",
     np.float32),
    (lambda: clustered_random(2048), "window", np.float32),
    (lambda: random_diag_dominant(2048, nnz_per_row=6, seed=0),
     "butterfly", np.float32),
    (lambda: banded_random(1024, [1, -1, 9, -9], seed=0), "dia",
     "df32"),
    (lambda: random_diag_dominant(2048, nnz_per_row=6, seed=0),
     "butterfly", "df32"),                          # DF leaf pairs
]


@pytest.mark.parametrize("make,fmt,dtype", CASES)
def test_roundtrip_matches_fresh_build(tmp_path, make, fmt, dtype):
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.ops.precision import df_from_f64
    csr = make()
    fresh = build_operator(csr, format=fmt, dtype=dtype)
    built = build_operator(csr, format=fmt, dtype=dtype,
                           cache_dir=str(tmp_path))      # build + save
    cached = build_operator(csr, format=fmt, dtype=dtype,
                            cache_dir=str(tmp_path))     # load
    assert type(cached) is type(fresh)
    x_host = np.random.default_rng(0).standard_normal(csr.shape[1])
    if dtype == "df32":
        x = df_from_f64(x_host)
    else:
        x = jnp.asarray(x_host, jnp.float32)
    y_fresh = _spmv_host(fresh, x)
    np.testing.assert_array_equal(_spmv_host(built, x), y_fresh)
    np.testing.assert_array_equal(_spmv_host(cached, x), y_fresh)


def test_key_sensitivity():
    csr = banded_random(512, [1, -1, 7, -7], seed=0)
    base = opcache.operator_key(csr, format="auto", dtype="float32",
                                ell_width=None)
    assert base == opcache.operator_key(csr, format="auto",
                                        dtype="float32", ell_width=None)
    # any option change -> different key
    assert base != opcache.operator_key(csr, format="dia",
                                        dtype="float32", ell_width=None)
    assert base != opcache.operator_key(csr, format="auto",
                                        dtype="df32", ell_width=None)
    # any value change -> different key
    csr2 = banded_random(512, [1, -1, 7, -7], seed=1)
    assert base != opcache.operator_key(csr2, format="auto",
                                        dtype="float32", ell_width=None)


def test_partition_roundtrip_distributed_solve(tmp_path):
    """A cached PartitionedMatrix must drive the distributed solver to
    the same trajectory as a fresh partition (same n_iter, bit-equal
    relres)."""
    import jax.numpy as jnp
    from mpi_bicgstab_tpu.parallel.driver import solve_distributed
    from mpi_bicgstab_tpu.parallel.partition import partition_csr
    from mpi_bicgstab_tpu.utils.config import SolverConfig
    csr = banded_random(512, [1, -1, 7, -7], seed=0)
    b = csr.matvec(np.ones(csr.nrows))
    cfg = SolverConfig(tol=1e-8, max_iter=200, dtype=jnp.float64)
    fresh = partition_csr(csr, 4, dtype=np.float64)
    partition_csr(csr, 4, dtype=np.float64,
                  cache_dir=str(tmp_path))                # build + save
    cached = partition_csr(csr, 4, dtype=np.float64,
                           cache_dir=str(tmp_path))       # load
    assert type(cached) is type(fresh)
    r1 = solve_distributed(fresh, b, method="bicgstab", cfg=cfg)
    r2 = solve_distributed(cached, b, method="bicgstab", cfg=cfg)
    assert int(r1.n_iter) == int(r2.n_iter)
    assert float(r1.final_relres) == float(r2.final_relres)
    assert bool(r2.converged)


def test_corrupt_entry_falls_back_to_rebuild(tmp_path):
    csr = banded_random(512, [1, -1, 7, -7], seed=0)
    op = build_operator(csr, format="dia", dtype=np.float32,
                        cache_dir=str(tmp_path))
    files = list(tmp_path.glob("layout_*.npz"))
    assert len(files) == 1
    files[0].write_bytes(b"not an npz")
    op2 = build_operator(csr, format="dia", dtype=np.float32,
                         cache_dir=str(tmp_path))
    assert type(op2) is type(op)
    np.testing.assert_array_equal(np.asarray(op2.vals),
                                  np.asarray(op.vals))


def test_env_default_cache_dir(tmp_path, monkeypatch):
    """MBT_LAYOUT_CACHE provides a process-wide default so code paths
    that don't thread cache_dir (bench helpers, scripts) still cache."""
    monkeypatch.setenv("MBT_LAYOUT_CACHE", str(tmp_path))
    csr = banded_random(512, [1, -1, 7, -7], seed=0)
    build_operator(csr, format="dia", dtype=np.float32)
    assert len(list(tmp_path.glob("layout_*.npz"))) == 1
    # explicit '0' disables even with the env set
    build_operator(csr, format="ell", dtype=np.float32, cache_dir="0")
    assert len(list(tmp_path.glob("layout_*.npz"))) == 1
