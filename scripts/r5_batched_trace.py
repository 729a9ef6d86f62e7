"""Device trace of the fully-fused batched-8 classic iteration at 1.6M
(round 5): the bench measures ~3.2-4.1 ms/iter through
api.solve_batched while round 4 recorded 1.45 ms, with the batched
kernel + solver code unchanged since (git diff 91ee9f5..HEAD). Per-op
device durations of one chained tol=0 run localize where the extra
~2 ms/iter lives (kernels vs XLA body passes).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mpi_bicgstab_tpu.api import solve_batched
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.models.problem import build_problem
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    k = 8
    K = 40
    csr = transport_like(n)
    prob = build_problem(csr, dtype="float32", multiple=1024)
    A = prob.A
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((k, prob.n)), jnp.float32)
    cfg = SolverConfig(tol=0.0, max_iter=K, dtype="float32", restarts=0)

    def run():
        r = solve_batched(A, B, method="bicgstab", cfg=cfg)
        jax.block_until_ready(r.x)

    run()                     # compile + warm
    trace_dir = "/tmp/r5_batched_trace"
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
                module_s = max(module_s, ev["dur"] / 1e6)
                continue
            if "Ops" not in lane:
                continue
            name = str(ev.get("name", ""))
            tot[name] += ev["dur"] / 1e6
            cnt[name] += 1

    print(json.dumps({"n": n, "k": k, "K": K,
                      "module_s": round(module_s, 6),
                      "per_iter_s": round(module_s / K, 6)
                      if module_s else None}), flush=True)
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, s in items[:18]:
        print(json.dumps({"op": name[:90], "total_s": round(s, 6),
                          "per_iter_us": round(s / K * 1e6, 1),
                          "count": cnt[name]}), flush=True)


if __name__ == "__main__":
    main()
