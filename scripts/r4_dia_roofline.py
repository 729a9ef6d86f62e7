#!/usr/bin/env python
"""Round-4 DIA SpMV roofline cross-check (VERDICT r3 weak #5): the
bench of record claims 189 Gnnz/s at 4.53 B/nnz -> 857 GB/s implied,
above both the measured (694) and spec (819) HBM bandwidth. Two
independent checks on the real chip:

1. Long-chain slope (K2 >= 480): a 4x longer chain shrinks the
   relay-sync noise term 4x relative to the work term; if the 189 was
   slope noise the long chain reads lower.
2. jax.profiler device trace of the fori_loop region: the on-device
   duration of the compiled chain, immune to host sync noise entirely.

Prints one JSON line with both rates and the implied GB/s for each.
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    os.environ.setdefault("MBT_LAYOUT_CACHE", os.path.join(
        os.path.expanduser("~"), ".cache", "mpi_bicgstab_tpu",
        "layouts"))
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mpi_bicgstab_tpu.benchmarks.runner import _slope_time
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.ops.layout import spmv as generic_spmv

    n = 1_602_112
    csr = transport_like(n)
    nnz = csr.nnz
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    A = prob.A
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(prob.n), dtype=jnp.float32)

    def make_chain(K):
        @jax.jit
        def chain(v):
            def body(i, v):
                y = generic_spmv(A, v)
                return y / (1.0 + jnp.sum(jnp.abs(y)))

            return jnp.sum(lax.fori_loop(0, K, body, v))

        return lambda: chain(x0)

    out = {"n": n, "nnz": nnz, "layout": type(A).__name__}
    # --- check 1: long chains, several K pairs ---
    # implied model: vals-only HBM traffic (4 B/nnz) — the iterate and
    # result are VMEM-resident loop-carried buffers (see bench.py
    # _bytes_per_nnz_dia and docs/RESULTS_TPU.md roofline section)
    for k1, k2 in ((20, 120), (40, 480), (80, 960)):
        sec = _slope_time(make_chain, K1=k1, K2=k2, reps=5)
        out[f"slope_{k1}_{k2}_nnz_per_s"] = round(nnz / sec, 1)
        out[f"slope_{k1}_{k2}_implied_GBps"] = round(
            nnz / sec * 4.0 / 1e9, 1)

    # --- check 2: profiler trace of the chain region ---
    K = 480
    c = make_chain(K)
    float(c())            # compile + warm
    trace_dir = "/tmp/r4_dia_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        float(c())
    # find the longest device-side event: the whole jit(chain) program
    dur_ns = _longest_xla_op_ns(trace_dir)
    if dur_ns:
        sec_iter = dur_ns / 1e9 / K
        out["trace_total_s"] = round(dur_ns / 1e9, 6)
        out["trace_nnz_per_s"] = round(nnz / sec_iter, 1)
        out["trace_implied_GBps"] = round(
            nnz / sec_iter * 4.0 / 1e9, 1)
    print(json.dumps(out), flush=True)


def _longest_xla_op_ns(trace_dir):
    """Largest single duration among DEVICE-side trace events — with
    one jit(chain) call in the trace window this is the XLA-module
    event of the program itself. Host-thread events (python frames,
    np.asarray waits) must be excluded: they include the relay's
    ~35 ms sync and over-read the duration by >50% (observed round 4:
    94.6 ms host event vs 58.9 ms jit_chain device event)."""
    best = 0
    for path in glob.glob(os.path.join(
            trace_dir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        evs = data.get("traceEvents", [])
        device_pids = {
            ev["pid"] for ev in evs
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
            and "device:" in str(ev.get("args", {}).get("name", ""))}
        for ev in evs:
            if (ev.get("ph") == "X" and "dur" in ev
                    and ev.get("pid") in device_pids):
                best = max(best, int(ev["dur"] * 1000))  # us -> ns
    return best


if __name__ == "__main__":
    main()
