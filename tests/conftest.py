"""Test environment: 8 virtual CPU devices + float64.

The TPU analogue of the reference's laptop `mpirun -np 1..4` testing
(main.c:2-5 comments): a fake 8-device mesh on the host CPU so the
shard_map distributed path is exercised without hardware, and x64 so
convergence tests can reach the reference's 1e-12..1e-15 tolerances.

Set MBT_TEST_PLATFORM=tpu to run the suite against the real chip
instead (single device — the distributed tests then need the virtual
mesh and will error; run single-device files only). x64 stays on: host
staging uses f64, device arrays are created with explicit dtypes.
"""
import os

_PLATFORM = os.environ.get("MBT_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel) via a
# sitecustomize hook; override after import so tests run on the fake
# 8-device CPU mesh (or the requested platform) regardless.
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("MBT_X64", "1") != "0":
    # MBT_X64=0 is for the on-chip compiled-kernel run (-m chip):
    # Mosaic rejects nonzero lane-shift rolls under x64, so the chip
    # kernel tests need a process with x64 OFF. Everything precision-
    # sensitive is deselected by the marker in that run.
    jax.config.update("jax_enable_x64", True)
