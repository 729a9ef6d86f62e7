"""Benchmark runner: SpMV nnz/s, solver time-per-iteration, full solves.

Mirrors what the reference measures (BASELINE.md): per-run IO time, total
time, avg time/iter (solver.c:129-140), on a Transport.mtx-profile matrix
(1.6M rows, ~24M nnz). With no network egress the benchmark matrix is
models.generators.transport_like, which matches Transport's size/density/
bandedness profile (README.md:32-42).

Baseline normalization (the reference publishes plots, not numbers —
BASELINE.json "published": {}): we anchor vs_baseline to an estimated
reference SpMV throughput of 4.0e9 nnz/s per A64FX process-domain (one
CMG: ~256 GB/s HBM2 feeding a ~12.7 B/nnz f64 CSR kernel at the ~20%
efficiency typical of unstructured SpMV on that machine). That is the
per-device unit the reference's strong-scaling plots normalize against.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_SPMV_NNZ_PER_S = 4.0e9  # estimated reference per-device SpMV rate


def _timeit(fn, sync, warmup=3, iters=20):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench_spmv(csr, dtype, devices=1, iters=20):
    import jax
    import jax.numpy as jnp

    nnz = csr.nnz
    if devices > 1:
        from mpi_bicgstab_tpu.parallel.driver import (make_dist_spmv,
                                                      put_partitioned,
                                                      put_vector)
        from mpi_bicgstab_tpu.parallel.mesh import make_row_mesh
        from mpi_bicgstab_tpu.parallel.partition import partition_csr
        part = partition_csr(csr, devices, dtype=np.dtype(dtype))
        mesh = make_row_mesh(devices)
        part_d = put_partitioned(part, mesh)
        spmv = make_dist_spmv(part_d, mesh)
        x = put_vector(np.random.default_rng(0).standard_normal(
            part.n_global), part, mesh, dtype)
        sec = _timeit(lambda: spmv(x), jax.block_until_ready, iters=iters)
    else:
        from mpi_bicgstab_tpu.models.problem import build_problem
        from mpi_bicgstab_tpu.ops.spmv import ell_spmv
        prob = build_problem(csr, dtype=dtype, multiple=1024)
        A = prob.A
        spmv = jax.jit(lambda v: ell_spmv(A, v))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(prob.n),
                        dtype=dtype)
        sec = _timeit(lambda: spmv(x), jax.block_until_ready, iters=iters)
    return {"spmv_s": sec, "spmv_nnz_per_s": nnz / sec,
            "spmv_gbytes_per_s": nnz * (np.dtype(dtype).itemsize + 4) / sec / 1e9}


def bench_iteration(csr, dtype, devices=1, method="pipe_bicgstab",
                    iters=50):
    """Time per solver iteration: run with tol=0 so exactly max_iter
    iterations execute, fenced, minus nothing — the avg time/iter the
    reference prints (solver.c:139)."""
    import jax
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    cfg = SolverConfig(tol=0.0, max_iter=iters, dtype=dtype)
    b_host = csr.matvec(np.ones(csr.nrows))
    if devices > 1:
        from mpi_bicgstab_tpu.parallel.driver import solve_distributed
        from mpi_bicgstab_tpu.parallel.partition import partition_csr
        part = partition_csr(csr, devices, dtype=np.dtype(dtype))
        runner = lambda: solve_distributed(part, b_host, method=method,  # noqa: E731
                                           cfg=cfg)
    else:
        from mpi_bicgstab_tpu.api import solve
        from mpi_bicgstab_tpu.models.problem import build_problem
        prob = build_problem(csr, dtype=dtype, multiple=1024)
        runner = lambda: solve(prob.A, prob.b, method=method, cfg=cfg)  # noqa: E731

    res = runner()
    jax.block_until_ready(res.x)     # compile
    t0 = time.perf_counter()
    res = runner()
    jax.block_until_ready(res.x)
    total = time.perf_counter() - t0
    k = max(int(res.n_iter), 1)
    return {"iter_method": method, "iters_run": k,
            "time_per_iter_s": total / k,
            "nnz": csr.nnz,
            "spmv_equiv_nnz_per_s": 2 * csr.nnz * k / total}


def run_bench(args):
    """CLI `bench` entry; prints a JSON line per requested benchmark."""
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = {"float32": jnp.float32, "float64": jnp.float64}[args.dtype]

    from mpi_bicgstab_tpu.cli import _load_matrix
    csr, io_time = _load_matrix(args.matrix, dtype)
    what = args.what.split(",")
    out = {"matrix": args.matrix, "n": csr.nrows, "nnz": csr.nnz,
           "dtype": args.dtype, "devices": args.devices,
           "backend": jax.default_backend(), "io_time_s": round(io_time, 4)}
    if "spmv" in what:
        out.update(bench_spmv(csr, dtype, args.devices, iters=args.iters))
        out["vs_baseline"] = out["spmv_nnz_per_s"] / REF_SPMV_NNZ_PER_S
    if "iter" in what:
        out.update(bench_iteration(csr, dtype, args.devices,
                                   iters=args.iters))
    print(json.dumps(out))
    return 0
