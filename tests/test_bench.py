"""Smoke coverage for the benchmark runner (benchmarks/runner.py).

The reference's entire measurement apparatus (main_repeat.c, the
no-overlap section timers) exists to produce avg-time-per-iter and
scaling numbers; these tests pin the runner's CONTRACT — the slope
methodology produces positive finite times and the advertised keys —
on tiny problems, so the bench of record can't silently rot. Rates
themselves are not asserted (CPU timings are meaningless).
"""
import numpy as np
import pytest

from mpi_bicgstab_tpu.benchmarks import runner as R
from mpi_bicgstab_tpu.models.generators import banded_random


@pytest.fixture(scope="module")
def csr():
    # big enough that per-iteration work dominates host timer noise
    # (the slope sign is asserted below), small enough to stay fast
    return banded_random(8192, [1, -1, 20, -20], seed=0)


def test_bench_spmv_keys(csr):
    import jax.numpy as jnp
    r = R.bench_spmv(csr, jnp.float32, devices=1, iters=6)
    assert r["spmv_s"] > 0 and np.isfinite(r["spmv_s"])
    assert r["spmv_nnz_per_s"] == csr.nnz / r["spmv_s"]
    assert r["spmv_layout"] is not None


def test_bench_iteration_single_and_mesh(csr):
    import jax.numpy as jnp
    r1 = R.bench_iteration(csr, jnp.float32, devices=1,
                           method="bicgstab", iters=6)
    assert r1["time_per_iter_s"] > 0
    r2 = R.bench_iteration(csr, jnp.float32, devices=2,
                           method="bicgstab", iters=6)
    assert r2["time_per_iter_s"] > 0


def test_bench_scaling_sweep(csr):
    import jax.numpy as jnp
    r = R.bench_scaling(csr, jnp.float32, max_devices=2,
                        method="bicgstab", iters=6)
    assert r["scaling_devices"] == [1, 2]
    assert r["speedup_d1"] == 1.0
    assert r["time_per_iter_s_d2"] > 0
    assert r["speedup_d2"] > 0
    # honesty label: this run is on the virtual CPU mesh, not ICI
    assert r["scaling_fabric"].endswith("virtual-mesh")


def test_bench_shifted_iteration_runs(csr):
    r = R.bench_shifted_iteration(csr, "float32", sigma_len=32, seed=3,
                                  devices=1, iters=8, shift_block=0)
    assert r["time_per_iter_s"] > 0
    assert r["sigma_len"] == 32
    assert "sigma_devices" not in r   # only reported when sharded
