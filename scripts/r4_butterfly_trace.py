#!/usr/bin/env python
"""Round-4: device-side op breakdown of the full butterfly SpMV at
1.6M via jax.profiler — per-XLA-op durations of one chained run, so
the 3.13 ms/iter budget is attributed to real device ops instead of
standalone phase re-runs (whose sum over-counts by ~0.6 ms).

Prints the top device ops by total duration as JSON lines.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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

    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops import pallas_butterfly as PB
    from mpi_bicgstab_tpu.ops.butterfly import _LANES
    from mpi_bicgstab_tpu.ops.layout import build_operator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    K = 40
    csr = random_diag_dominant(n, nnz_per_row=8, seed=0)
    bf = build_operator(csr, format="butterfly", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(csr.nrows), jnp.float32)

    @jax.jit
    def chain(v):
        def body(i, v):
            y = PB.butterfly_spmv(bf, v)
            return v / (1.0 + jnp.abs(jnp.sum(y[:_LANES])))

        return jnp.sum(lax.fori_loop(0, K, body, v))

    float(chain(x))          # compile + warm
    trace_dir = "/tmp/r4_bf_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        float(chain(x))

    tot = defaultdict(float)
    cnt = defaultdict(int)
    module_s = 0.0
    for path in glob.glob(os.path.join(
            trace_dir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        evs = data.get("traceEvents", [])
        dev_pids = {
            ev["pid"] for ev in evs
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
            and "device:" in str(ev.get("args", {}).get("name", ""))}
        tid_name = {
            (ev["pid"], ev.get("tid")): ev["args"].get("name")
            for ev in evs if ev.get("ph") == "M"
            and ev.get("name") == "thread_name"}
        for ev in evs:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            lane = str(tid_name.get((ev["pid"], ev.get("tid")), ""))
            if "Module" in lane:
                module_s = max(module_s, ev["dur"] / 1e6)
                continue
            if "Ops" not in lane:
                continue
            name = str(ev.get("name", ""))
            tot[name] += ev["dur"] / 1e6
            cnt[name] += 1

    print(json.dumps({"n": n, "nnz": csr.nnz, "K": K,
                      "module_s": round(module_s, 6),
                      "per_iter_s": round(module_s / K, 6),
                      "nnz_per_s": round(csr.nnz * K / module_s, 1)
                      if module_s else None}), flush=True)
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, s in items[:14]:
        print(json.dumps({"op": name[:80], "total_s": round(s, 6),
                          "per_iter_us": round(s / K * 1e6, 1),
                          "count": cnt[name]}), flush=True)


if __name__ == "__main__":
    main()
