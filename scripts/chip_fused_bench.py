#!/usr/bin/env python
"""One-shot chip measurement of the fused method matrix.

Slope-times every classic-family method at Transport scale (1.6M rows,
~24M nnz, 15-diagonal) in f32 and df32, fused vs XLA, and prints one
JSON object. Run on the TPU:

    python scripts/chip_fused_bench.py            # full matrix
    python scripts/chip_fused_bench.py --quick    # f32 only, 2 methods

The fused/XLA A/B uses the dispatch env switches
(MBT_FUSED_{CLASSIC,CLASSIC_DF,CA,CA_DF,PIPE,DF,DF2}=0), set before
the timing call so `api._solve_jit` traces the intended build.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_FUSE_VARS = ("MBT_FUSED_CLASSIC", "MBT_FUSED_CLASSIC_DF",
              "MBT_FUSED_CA", "MBT_FUSED_CA_DF", "MBT_FUSED_PIPE",
              "MBT_FUSED_DF", "MBT_FUSED_DF2", "MBT_FUSED_DF_BODIES")


def _set_fused(on: bool):
    for v in _FUSE_VARS:
        if on:
            os.environ.pop(v, None)
        else:
            os.environ[v] = "0"
    # the dispatch reads the env at TRACE time; identical (method, cfg,
    # shapes) would otherwise reuse the cached build from the other arm
    import jax
    jax.clear_caches()


def main():
    quick = "--quick" in sys.argv
    n = 200_704 if quick else 1_602_112
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    from mpi_bicgstab_tpu.benchmarks.runner import bench_iteration
    from mpi_bicgstab_tpu.models.generators import transport_like
    csr = transport_like(n)

    methods = (["bicgstab", "pipe_bicgstab"] if quick else
               ["bicgstab", "ca_bicgstab", "pipe_bicgstab",
                "pipe_bicgstab_rr"])
    dtypes = ["float32"] if quick else ["float32", "df32"]
    out = {"n": n, "nnz": csr.nnz}
    for dt in dtypes:
        iters = 60 if dt == "float32" else 24
        for m in methods:
            for fused in (True, False):
                _set_fused(fused)
                key = f"{'df32' if dt == 'df32' else 'f32'}_{m}_" \
                      f"{'fused' if fused else 'xla'}_s_per_iter"
                try:
                    r = bench_iteration(csr, dt, devices=1, method=m,
                                        iters=iters)
                    out[key] = round(r["time_per_iter_s"], 7)
                except Exception as e:  # noqa: BLE001
                    out[key] = f"ERROR: {type(e).__name__}: {e}"
                print(f"  {key}: {out[key]}", file=sys.stderr)
    _set_fused(True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
