#!/usr/bin/env python
"""Headline benchmark: SpMV throughput (nnz/s) on a Transport.mtx-profile
matrix, single chip — the north-star metric from BASELINE.md ("SpMV
nnz/s/chip and time-per-iteration on Transport.mtx").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline anchors to an estimated 4.0e9 nnz/s per A64FX process-domain
for the reference's f64 CSR SpMV (see benchmarks/runner.py for the
derivation; the reference publishes plots, not numbers).

The matrix is models.generators.transport_like: 1.6M rows, ~15-diagonal
band, ~24M nnz, unsymmetric values, diagonally dominant — the same
size/density profile as SuiteSparse Transport (reference README.md:32-42),
generated locally because this environment has no network egress and the
reference .gitignores its data/.

UN-LOSABLE DESIGN (round-4 lesson: BENCH_r04 was rc=124/parsed=null —
the driver's timeout killed the old all-or-nothing script before its
single end-of-run print). The reference prints its measurements every
run (main.c:90-93, solver.c:129-140); so must we, whatever happens:
  * sections run in PRIORITY order, each wrapped in try/except;
  * after every section the partial results are flushed to
    docs/data/bench_partial.json (plus a stderr progress line);
  * a global deadline (MBT_BENCH_BUDGET_S, default 480 s) is enforced
    two ways: each section is skipped when the time remaining is below
    its cost estimate, and SIGALRM fires at the deadline;
  * SIGTERM/SIGINT/SIGALRM all print the final JSON line from whatever
    has been measured so far and exit 0 — an external `timeout` kill
    now yields a parseable record instead of nothing.
Layout + XLA compile caches live in-repo (.cache/) so the end-of-round
driver invocation reuses everything warmed mid-round.

Honesty guards (round-2 VERDICT weak #3): throughput numbers are the
MEDIAN of three slope measurements (not best-of-N, which harvests relay
noise), and each layout carries its bytes-per-nnz roofline model so the
implied HBM bandwidth is reported next to the chip's measured streaming
bandwidth (~740 GB/s pure-read; 819 GB/s spec).
"""
import json
import os
import signal
import sys
import time

import numpy as np

HBM_MEASURED_GBPS = 740.0   # pure-read 512 MB stream (r4_probe3; the
# round-1 694 was an fma15 read+write chain — the wrong ceiling for
# the read-dominated SpMV streams)
HBM_SPEC_GBPS = 819.0       # v5e datasheet

REPO = os.path.dirname(os.path.abspath(__file__))
PARTIAL_PATH = os.path.join(REPO, "docs", "data", "bench_partial.json")


def _bytes_per_nnz_dia(W: int, df: bool) -> float:
    """HBM bytes per nnz for the looped DIA SpMV: the vals stream ONLY
    (4 B f32 / 8 B df32 per slot).

    Round-4 roofline settlement (VERDICT r3 weak #5): the old model
    added x+y traffic (8/W B/nnz) and implied 857 GB/s > the 819 GB/s
    spec. A jax.profiler device trace of the K=480 chain (the
    jit_chain XLA-module event: 58.87 ms -> 122.6 us/iter, matching
    the host-side slope within 1% — scripts/r4_dia_roofline.py) shows
    the rate is real on-device; what the old model got wrong is that
    the 6.4 MB iterate/result are loop-carried buffers XLA:TPU keeps
    VMEM-resident (v5e VMEM is 128 MiB; a 96 MB loop-INVARIANT buffer
    measured 5.8 TB/s in a read+write chain — scripts/r4_probe2.py),
    so per-iteration HBM traffic is the 96 MB vals stream alone:
    784 GB/s implied, ~96% of spec. Real solver loops carry their
    vectors the same way (the fused Pallas iterations pin them in VMEM
    explicitly), so vals-only is the honest HBM model for this layout."""
    return 4.0 * (2 if df else 1)


def _bytes_per_nnz_window(width: int, df: bool) -> float:
    """vals(4) + sub_sel(1) + lane_idx(1) per slot; x resident, y
    written once per row (4 B, doubled in DF) amortized over the row's
    `width` slots."""
    val = 4.0 * (2 if df else 1)
    return val + 2.0 + 4.0 / max(width, 1) * (2 if df else 1)


class BenchState:
    """Accumulates results; flushes a partial file after every section;
    prints the final JSON line exactly once (normal exit OR signal)."""

    def __init__(self, budget_s: float):
        self.t0 = time.perf_counter()
        self.deadline = self.t0 + budget_s
        self.out = {"metric": "spmv_nnz_per_s", "value": 0.0,
                    "unit": "nnz/s", "vs_baseline": 0.0}
        self.section_times = {}
        self.skipped = []
        self._printed = False

    def time_left(self) -> float:
        return self.deadline - time.perf_counter()

    def flush_partial(self):
        try:
            os.makedirs(os.path.dirname(PARTIAL_PATH), exist_ok=True)
            rec = dict(self.out)
            rec["section_times_s"] = {k: round(v, 1) for k, v
                                      in self.section_times.items()}
            rec["sections_skipped"] = self.skipped
            with open(PARTIAL_PATH, "w") as f:
                json.dump(rec, f, indent=1)
        except OSError:
            pass

    def section(self, name: str, est_s: float, fn):
        """Run one section if the global budget allows; merge its dict
        into the results; never let it take the whole bench down."""
        if self.time_left() < est_s:
            self.skipped.append(name)
            print(f"[bench] SKIP {name} (est {est_s:.0f}s > "
                  f"{self.time_left():.0f}s left)", file=sys.stderr,
                  flush=True)
            self.flush_partial()
            return
        t0 = time.perf_counter()
        try:
            res = fn()
            if res:
                self.out.update(res)
        except Exception as e:  # noqa: BLE001
            self.out[f"error_{name}"] = f"{type(e).__name__}: {e}"[:200]
        dt = time.perf_counter() - t0
        self.section_times[name] = dt
        print(f"[bench] {name}: {dt:.1f}s "
              f"({self.time_left():.0f}s left)", file=sys.stderr,
              flush=True)
        self.flush_partial()

    def print_final(self):
        if self._printed:
            return
        self._printed = True
        self.out["sections_skipped"] = self.skipped
        self.out["bench_wall_s"] = round(time.perf_counter() - self.t0, 1)
        print(json.dumps(self.out), flush=True)


_STATE: BenchState | None = None


def _die_with_record(signum, frame):  # noqa: ARG001
    """timeout/SIGTERM/SIGALRM → emit whatever was measured, rc 0."""
    if _STATE is not None:
        _STATE.out["truncated_by_signal"] = int(signum)
        _STATE.flush_partial()
        _STATE.print_final()
    sys.stdout.flush()
    os._exit(0)


def _median_spmv(csr, dtype, iters, reps=3, prob=None):
    """Median of `reps` slope measurements. The operator is built ONCE
    and shared (prob=): per-call build_problem repeated the layout
    analysis and a ~100 MB device_put through the TPU relay, which
    dominated this section's wall time (round-5 measurement: 482 s for
    three reps at 1.6M, nearly all of it host-side rebuild/transfer)."""
    from mpi_bicgstab_tpu.benchmarks.runner import bench_spmv
    if prob is None:
        from mpi_bicgstab_tpu.models.problem import build_problem
        prob = build_problem(csr, dtype=dtype, multiple=1024)
    runs = [bench_spmv(csr, dtype, devices=1, iters=iters, prob=prob)
            for _ in range(reps)]
    runs.sort(key=lambda r: r["spmv_nnz_per_s"])
    return runs[len(runs) // 2]


def _backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe backend init in a SUBPROCESS with a timeout. A half-hung
    TPU relay blocks `import jax; jax.devices()` forever (observed:
    the axon transport can wedge so even backend init never returns) —
    probing in-process would hang this script and whatever driver
    invoked it. CPU backends skip the probe (always reachable)."""
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    global _STATE
    small = "--small" in sys.argv  # quick mode for CPU smoke runs
    budget = float(os.environ.get("MBT_BENCH_BUDGET_S",
                                  "240" if small else "480"))
    st = _STATE = BenchState(budget)
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _die_with_record)
    signal.alarm(int(budget) + 20)  # hard stop just past the deadline

    n = 200_000 if small else 1_602_112
    st.out["dtype"] = "float32"
    st.out["n"] = n

    if not _backend_reachable():
        st.out["error"] = ("accelerator backend unreachable (init timed "
                           "out — relay down); no measurement taken")
        st.print_final()
        return

    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    # both caches in-repo: the end-of-round driver run then reuses
    # layouts/compiles warmed mid-round instead of rebuilding for
    # minutes (what timed out round 4's record)
    os.environ.setdefault("MBT_LAYOUT_CACHE",
                          os.path.join(REPO, ".cache", "layouts"))
    os.environ.setdefault("MBT_COMPILE_CACHE",
                          os.path.join(REPO, ".cache", "xla"))
    enable_compile_cache()

    import jax
    # CPU smoke runs: the df32 sections need x64 for exact DF ops
    # (same policy as cli._maybe_enable_x64; on TPU x64 must stay OFF
    # — Mosaic fence)
    if jax.default_backend() != "tpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float32
    st.out["backend"] = jax.default_backend()

    from mpi_bicgstab_tpu.benchmarks.runner import (REF_SPMV_NNZ_PER_S,
                                                    bench_batched_iteration,
                                                    bench_iteration,
                                                    bench_shifted_iteration,
                                                    bench_spmv)
    from mpi_bicgstab_tpu.models.generators import transport_like

    t0 = time.perf_counter()
    csr = transport_like(n)
    st.out["nnz"] = csr.nnz
    st.out["matrix_gen_time_s"] = round(time.perf_counter() - t0, 2)

    iters = 30 if small else 120   # longer chains damp relay noise

    # one operator build per dtype, shared by every section that
    # touches the transport matrix (see _median_spmv docstring)
    from mpi_bicgstab_tpu.models.problem import build_problem
    probs = {}

    def _prob(dt):
        if dt not in probs:
            probs[dt] = build_problem(csr, dtype=dt, multiple=1024)
        return probs[dt]

    # ---- priority 1: the headline metric -----------------------------
    def s_spmv():
        spmv = _median_spmv(csr, dtype, iters, prob=_prob(dtype))
        bpn = _bytes_per_nnz_dia(15, False)
        return {
            "value": round(spmv["spmv_nnz_per_s"], 1),
            "vs_baseline": round(
                spmv["spmv_nnz_per_s"] / REF_SPMV_NNZ_PER_S, 3),
            "spmv_time_s": round(spmv["spmv_s"], 6),
            "spmv_implied_GBps": round(
                spmv["spmv_nnz_per_s"] * bpn / 1e9, 1),
            "hbm_measured_GBps": HBM_MEASURED_GBPS,
            "hbm_spec_GBps": HBM_SPEC_GBPS,
        }
    st.section("spmv_f32", 90, s_spmv)

    # ---- priority 2: df32 SpMV (reference-parity precision; its
    # arithmetic is all-f64 — matrix.c:498-516). Round-4's df_fma
    # rewrite is measured HERE, in the record, not only in a probe.
    def s_spmv_df():
        spmv_df = _median_spmv(csr, "df32", max(iters // 2, 20),
                               prob=_prob("df32"))
        return {
            "df32_spmv_nnz_per_s": round(spmv_df["spmv_nnz_per_s"], 1),
            "df32_spmv_implied_GBps": round(
                spmv_df["spmv_nnz_per_s"]
                * _bytes_per_nnz_dia(15, True) / 1e9, 1),
        }
    st.section("spmv_df32", 90, s_spmv_df)

    # ---- priority 3: per-iteration solver costs ----------------------
    def s_iter_classic():
        it = bench_iteration(csr, dtype, devices=1, method="bicgstab",
                             iters=iters, prob=_prob(dtype))
        return {"bicgstab_time_per_iter_s": round(
            it["time_per_iter_s"], 6)}
    st.section("iter_classic_f32", 60, s_iter_classic)

    def s_iter_classic_df():
        it = bench_iteration(csr, "df32", devices=1, method="bicgstab",
                             iters=30, prob=_prob("df32"))
        return {"df32_bicgstab_time_per_iter_s": round(
            it["time_per_iter_s"], 6)}
    st.section("iter_classic_df32", 60, s_iter_classic_df)

    def s_iter_pipe():
        it = bench_iteration(csr, dtype, devices=1,
                             method="pipe_bicgstab", iters=iters,
                             prob=_prob(dtype))
        return {"pipe_bicgstab_time_per_iter_s": round(
            it["time_per_iter_s"], 6)}
    st.section("iter_pipe_f32", 60, s_iter_pipe)

    def s_iter_pipe_df():
        it = bench_iteration(csr, "df32", devices=1,
                             method="pipe_bicgstab", iters=30,
                             prob=_prob("df32"))
        return {"df32_pipe_time_per_iter_s": round(
            it["time_per_iter_s"], 6)}
    st.section("iter_pipe_df32", 60, s_iter_pipe_df)

    # ---- priority 4: the flagship seed-switching workload ------------
    # sigma_len=512 at the FULL 1.6M scale — the reference's root
    # Makefile workload (main_shifted.c:13, Makefile:15).
    def s_switching():
        sw = bench_shifted_iteration(csr, dtype, sigma_len=512,
                                     seed=255, iters=24 if small else 40)
        return {"switching_time_per_iter_s_sigma512": round(
            sw["time_per_iter_s"], 6),
            "switching_n": n}
    st.section("switching_f32", 120, s_switching)

    # df32 switching at the reference scale (round-4 VERDICT missing
    # #3: previously only benched at 200k). [S=512, n=1.6M] df32 state
    # is x_set+p_set = 13.1 GB of the chip's 16 GB HBM — feasibility
    # is part of what this section measures; on failure it falls back
    # S 512→256→128 at full n and records which point fit.
    def s_switching_df():
        err = None
        for sl in ([64] if small else [512, 256, 128]):
            try:
                sw_df = bench_shifted_iteration(
                    csr, "df32", sigma_len=sl,
                    seed=min(255, sl - 1), iters=8 if small else 16)
                return {
                    f"switching_df32_time_per_iter_s_sigma{sl}": round(
                        sw_df["time_per_iter_s"], 6),
                    "switching_df32_n": n,
                    "switching_df32_sigma_len": sl,
                    **({"switching_df32_oom_note":
                        f"sigma 512 OOM at n={n}; largest fit {sl}"}
                       if sl != 512 and not small else {}),
                }
            except Exception as e:  # noqa: BLE001
                err = e
        raise err
    st.section("switching_df32", 150, s_switching_df)

    # ---- priority 5: alternate layouts at headline scale -------------
    def s_window():
        from mpi_bicgstab_tpu.models.generators import clustered_random
        n_w = 200_704 if small else 1_602_560
        csr_w = clustered_random(n_w)
        spmv_w = _median_spmv(csr_w, dtype, iters)
        win_width = spmv_w.get("spmv_window_width", 0)
        bpn_w = _bytes_per_nnz_window(max(win_width, 1), False)
        return {
            "window_spmv_nnz_per_s": round(spmv_w["spmv_nnz_per_s"], 1),
            "window_spmv_implied_GBps": (round(
                spmv_w["spmv_nnz_per_s"] * bpn_w / 1e9, 1) if win_width
                else float("nan")),
            "window_layout": spmv_w.get("spmv_layout"),
            "window_n": n_w,
        }
    st.section("window_spmv", 90, s_window)

    # uniform-random locality-free SpMV (butterfly routing). The host
    # routing build is minutes cold / seconds from the layout cache;
    # budget assumes the cache (warmed by mid-round runs).
    def s_uniform():
        from mpi_bicgstab_tpu.models.generators import random_diag_dominant
        n_u = 200_704 if small else 1_602_112
        csr_u = random_diag_dominant(n_u, nnz_per_row=8, seed=0)
        spmv_u = bench_spmv(csr_u, dtype, devices=1, iters=iters)
        return {"uniform_spmv_nnz_per_s": round(
            spmv_u["spmv_nnz_per_s"], 1),
            "uniform_layout": spmv_u.get("spmv_layout"),
            "uniform_n": n_u}
    st.section("uniform_spmv", 120, s_uniform)

    # df32 butterfly at the SAME 1.6M scale, as its OWN section so a
    # failure can't erase the f32 result (round-5: this sub-call used
    # to 413 the relay compile via closure-embedded constants, and the
    # XLA fallback it then took kernel-faulted the worker — both fixed,
    # but the isolation stays)
    def s_uniform_df():
        from mpi_bicgstab_tpu.benchmarks.runner import bench_spmv
        from mpi_bicgstab_tpu.models.generators import random_diag_dominant
        n_u = 200_704 if small else 1_602_112
        csr_u = random_diag_dominant(n_u, nnz_per_row=8, seed=0)
        spmv_u_df = bench_spmv(csr_u, "df32", devices=1,
                               iters=max(iters // 2, 20))
        return {"uniform_df32_spmv_nnz_per_s": round(
            spmv_u_df["spmv_nnz_per_s"], 1),
            "uniform_df32_n": n_u}
    st.section("uniform_df32_spmv", 90, s_uniform_df)

    # ---- priority 6: batched multi-RHS amortization -------------------
    def s_batched():
        it_b8 = bench_batched_iteration(csr, dtype, k=8,
                                        method="bicgstab",
                                        iters=max(iters // 2, 20),
                                        prob=_prob(dtype))
        out = {"batched8_time_per_iter_s": round(
            it_b8["time_per_iter_s"], 6)}
        base = st.out.get("bicgstab_time_per_iter_s")
        if base:
            out["batched8_per_rhs_speedup"] = round(
                8 * base / it_b8["time_per_iter_s"], 2)
        return out
    st.section("batched8", 90, s_batched)

    # ---- priority 7: Chebyshev-preconditioned hard-solve A/B ----------
    # full solves (the win is ~10x fewer iterations — per-iteration
    # metrics can't see it); the most expensive section, so it runs
    # LAST and its solves are capped.
    def s_cheby():
        from mpi_bicgstab_tpu.api import solve as _solve
        from mpi_bicgstab_tpu.models.generators import transport_hard
        from mpi_bicgstab_tpu.models.problem import build_problem
        from mpi_bicgstab_tpu.ops.cheby import ChebyPrecond, estimate_bounds
        from mpi_bicgstab_tpu.utils.config import SolverConfig
        csr_h = transport_hard(50_176 if small else 200_704)
        lo_b, hi_b = estimate_bounds(csr_h)

        def _wall(prob, cfg, **kw):
            r = _solve(prob.A, prob.b, method="bicgstab",
                       cfg=cfg, **kw)            # warm-up + compile
            t0 = time.perf_counter()
            r = _solve(prob.A, prob.b, method="bicgstab",
                       cfg=cfg, **kw)
            _ = float(r.final_relres)            # device->host fence
            return (time.perf_counter() - t0, int(r.n_iter),
                    float(r.true_relres))

        def _ab(dtype_h):
            prob = build_problem(csr_h, dtype=dtype_h, multiple=8192)
            cfg = SolverConfig(tol=1e-5, max_iter=20_000,
                               dtype=dtype_h, restarts=0)
            plain = _wall(prob, cfg)
            cheby = _wall(prob, cfg,
                          precond=ChebyPrecond(degree=8, lo=lo_b,
                                               hi=hi_b))
            return plain, cheby

        # Breakdown-aware A/B (round-3 VERDICT weak #3): a NaN true
        # residual on the plain run is recurrence BREAKDOWN, and a
        # speedup quoted against a dead baseline is meaningless. If f32
        # breaks down, redo BOTH sides in df32 and label the dtype.
        (t_plain, it_plain, tr_plain), (t_ch, it_ch, tr_ch) = \
            _ab(jnp.float32)
        ab_dtype = "float32"
        breakdown = not (np.isfinite(tr_plain) and np.isfinite(tr_ch))
        if breakdown and st.time_left() > 60:
            (t_plain, it_plain, tr_plain), (t_ch, it_ch, tr_ch) = \
                _ab("df32")
            ab_dtype = "df32"
        out = {
            "hard_solve_s": round(t_plain, 3),
            "hard_solve_iters": it_plain,
            "hard_solve_true_relres": float(f"{tr_plain:.3g}"),
            "hard_solve_cheby8_s": round(t_ch, 3),
            "hard_solve_cheby8_iters": it_ch,
            "hard_solve_cheby8_true_relres": float(f"{tr_ch:.3g}"),
            "hard_solve_ab_dtype": ab_dtype,
            "hard_solve_f32_breakdown": breakdown,
        }
        if np.isfinite(tr_plain) and np.isfinite(tr_ch):
            out["hard_solve_cheby8_speedup"] = round(t_plain / t_ch, 2)
        return out
    st.section("cheby_hard_ab", 120, s_cheby)

    st.print_final()


if __name__ == "__main__":
    main()
