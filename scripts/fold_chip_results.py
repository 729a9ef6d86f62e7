#!/usr/bin/env python
"""Fold the chip-session artifacts (/tmp/r3chip_*.json) into a
markdown summary with target checks — run after
scripts/chip_session_r3.sh completes, paste into docs/RESULTS_TPU.md.

Targets come from the round-2 VERDICT's "done =" criteria:
  - uniform-random butterfly SpMV >= 4 Gnnz/s (missing #1)
  - df32 pipe iter ~2.8 ms fused (weak #1) and <= 2.5x f32 (item #4)
  - windowed-ELL at the 1.6M headline scale (missing #5)
"""
import json
import os

D = "/tmp"


def _load(name):
    p = os.path.join(D, name)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            txt = f.read().strip()
        # take the LAST json-looking line (stages tee noise above it)
        for line in reversed(txt.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # noqa: BLE001
        print(f"  (unreadable {name}: {e})")
    return None


def _g(d, k, scale=1.0, fmt="{:.3g}"):
    if not d or k not in d or d[k] != d[k]:
        return "—"
    return fmt.format(d[k] * scale)


def main():
    bench = _load("r3chip_bench.json")
    fused = _load("r3chip_fused.json")
    bfly = _load("r3chip_butterfly.json")
    phases = _load("r3chip_butterfly_phases.json")
    ch_f = _load("r3chip_cheby_chain_f32.json")
    ch_d = _load("r3chip_cheby_chain_df32.json")

    print("## Round-3 chip session results (TPU v5e)\n")
    if bench:
        checks = []

        def row(label, key, unit="", scale=1.0):
            print(f"| {label} | {_g(bench, key, scale)}{unit} |")

        print("| metric | value |\n|---|---|")
        row("DIA SpMV f32", "value", " nnz/s")
        row("  implied HBM", "spmv_implied_GBps", " GB/s")
        row("DIA SpMV df32", "df32_spmv_nnz_per_s", " nnz/s")
        row("windowed-ELL @1.6M", "window_spmv_nnz_per_s", " nnz/s")
        row("uniform butterfly f32", "uniform_spmv_nnz_per_s", " nnz/s")
        row("uniform butterfly df32", "uniform_df32_spmv_nnz_per_s",
            " nnz/s")
        row("bicgstab iter f32", "bicgstab_time_per_iter_s", " s")
        row("bicgstab iter df32", "df32_bicgstab_time_per_iter_s", " s")
        row("pipe iter f32", "pipe_bicgstab_time_per_iter_s", " s")
        row("pipe iter df32", "df32_pipe_time_per_iter_s", " s")
        row("switching sigma512 f32", "switching_time_per_iter_s_sigma512",
            " s")
        row("batched8 per-RHS speedup", "batched8_per_rhs_speedup", "x")
        row("cheby8 hard-solve speedup", "hard_solve_cheby8_speedup", "x")
        print()

        u = bench.get("uniform_spmv_nnz_per_s", float("nan"))
        checks.append(("uniform >= 4 Gnnz/s (VERDICT missing #1)",
                       u == u and u >= 4e9, f"{u:.3g}"))
        dfp = bench.get("df32_pipe_time_per_iter_s", float("nan"))
        f32p = bench.get("pipe_bicgstab_time_per_iter_s", float("nan"))
        checks.append(("df32 pipe <= 2.9 ms (weak #1 target ~2.8)",
                       dfp == dfp and dfp <= 2.9e-3, f"{dfp:.3g}"))
        checks.append(("df32 pipe <= 2.5x f32 (item #4)",
                       dfp == dfp and f32p == f32p and dfp <= 2.5 * f32p,
                       f"ratio {dfp / f32p:.2f}" if f32p == f32p else "—"))
        w = bench.get("window_spmv_nnz_per_s", float("nan"))
        checks.append(("window @1.6M >= 10 Gnnz/s (docs claim 15.5)",
                       w == w and w >= 1e10, f"{w:.3g}"))
        print("### Target checks\n")
        for label, ok, val in checks:
            print(f"- {'PASS' if ok else 'MISS'}: {label} — {val}")
        print()
    else:
        print("(no r3chip_bench.json yet)\n")

    for name, d in (("fused method matrix", fused),
                    ("butterfly at both scales", bfly),
                    ("butterfly phase breakdown", phases),
                    ("cheby chain f32", ch_f),
                    ("cheby chain df32", ch_d)):
        print(f"### {name}\n")
        print("```json\n" + json.dumps(d) + "\n```\n" if d
              else "(missing)\n")


if __name__ == "__main__":
    main()
