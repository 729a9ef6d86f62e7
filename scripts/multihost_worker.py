"""One process of a multi-process (multi-host) distributed solve.

The runnable version of the reference's PJM job scripts (run.bash:2-9
launches mpirun over 4 nodes / 192 ranks): each process calls
jax.distributed.initialize, all processes build the same problem
host-side, and the solve runs under one GLOBAL mesh spanning every
process's devices — exactly how a TPU pod slice is driven (one Python
process per host, jax.devices() = all chips in the slice).

Launch (2-process CPU smoke, what tests/test_multihost.py does):

  XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu \
    python scripts/multihost_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id 0 &
  ...same with --process-id 1

On a real TPU pod slice, drop the env vars (each host sees its local
chips; ICI carries the collectives) and run one process per host.
"""
import os as _os
import sys as _os_sys
_os_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--method", default="bicgstab")
    ap.add_argument("--shifted", action="store_true")
    ap.add_argument("--dtype", default="float64",
                    choices=["float32", "float64", "df32"])
    args = ap.parse_args()

    import jax
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    if args.dtype in ("float64", "df32"):
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    from mpi_bicgstab_tpu.models.generators import banded_random
    from mpi_bicgstab_tpu.parallel.driver import (solve_distributed,
                                                  solve_shifted_distributed)
    from mpi_bicgstab_tpu.parallel.partition import partition_csr

    n_dev = jax.device_count()          # GLOBAL device count
    # every process builds the identical problem (the reference's
    # every-rank-reads-the-file design, matrix.c:315-341 — but from a
    # deterministic generator instead of a shared filesystem)
    csr = banded_random(args.n, [1, -1, 16, -16], seed=3)
    part_dtype = "df32" if args.dtype == "df32" else np.dtype(args.dtype)
    part = partition_csr(csr, n_dev, dtype=part_dtype)
    b = csr.matvec(np.ones(csr.nrows))

    if args.shifted:
        sigma = np.array([0.0, 0.05, 0.2, 1.0])
        res = solve_shifted_distributed(part, b, sigma, seed=3,
                                        method="shifted_lopbicg_switching")
        ok = bool(np.asarray(res.stop_flags).all())
        relres = float(res.final_relres)
    else:
        res = solve_distributed(part, b, method=args.method)
        ok = bool(res.converged)
        relres = float(res.final_relres)
        # check the LOCAL shards of x against the exact solution
        # (ones on logical rows, zeros on identity padding rows)
        if args.dtype == "float64":
            for shard in res.x.addressable_shards:
                data = np.asarray(shard.data)
                start = shard.index[0].start or 0
                expect = (np.arange(start, start + data.shape[0])
                          < csr.nrows).astype(np.float64)
                ok = ok and bool(np.abs(data - expect).max() < 1e-8)
    print(json.dumps({
        "sentinel": "MULTIHOST_OK" if ok else "MULTIHOST_FAIL",
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": n_dev,
        "local_devices": jax.local_device_count(),
        "n_iter": int(res.n_iter),
        "final_relres": relres,
    }), flush=True)
    jax.distributed.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
