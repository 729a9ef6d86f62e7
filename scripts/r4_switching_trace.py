#!/usr/bin/env python
"""Round-4: device-side op budget of the flagship seed-switching
solver at sigma_len=512, Transport scale (the main_shifted.c workload,
2.32 ms/iter in BENCH_r03). Prints the XLA-module per-iteration time
and the top device ops, so the next optimization targets the real
bottleneck (seed SpMVs? MXU shift matmuls? flush traffic? dots?)."""
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

    from mpi_bicgstab_tpu.benchmarks import runner as R
    from mpi_bicgstab_tpu.models.generators import transport_like

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    sigma_len = 512
    iters = 24
    csr = transport_like(n)

    # reuse the bench's own chain builder so the traced program IS the
    # benched program
    import time

    from mpi_bicgstab_tpu.api import solve_shifted
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import ShiftedConfig

    sigma = (np.arange(sigma_len, dtype=np.float64) + 1) \
        * (0.01 / sigma_len)
    seed = 255
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024,
                         sigma_seed=float(sigma[seed]))
    cfg = ShiftedConfig(tol=0.0, max_iter=iters, dtype=jnp.float32,
                        record_history=False)

    def run():
        res = solve_shifted(prob.A, prob.b, sigma, seed=seed,
                            method="shifted_lopbicg_switching",
                            cfg=cfg)
        return float(res.final_relres)

    run()                      # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    trace_dir = "/tmp/r4_sw_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        run()

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
                module_s += ev["dur"] / 1e6
                continue
            if "Ops" not in lane:
                continue
            name = str(ev.get("name", ""))
            tot[name] += ev["dur"] / 1e6
            cnt[name] += 1

    print(json.dumps({"n": n, "sigma_len": sigma_len, "iters": iters,
                      "wall_s": round(wall, 3),
                      "module_total_s": round(module_s, 6),
                      "per_iter_s": round(module_s / iters, 6)}),
          flush=True)
    for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:16]:
        print(json.dumps({"op": name[:70], "total_s": round(s, 6),
                          "per_iter_us": round(s / iters * 1e6, 1),
                          "count": cnt[name]}), flush=True)


if __name__ == "__main__":
    main()
