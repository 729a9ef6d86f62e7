#!/usr/bin/env python
"""Render docs/residual_hard1601k.png from the committed round-2 chip
runs (docs/data/r2_hard1601k_df32_*.csv) — the framework's analogue of
the reference's doc/residual_result.png: per-iteration relative
residuals of the four classic methods on the 1.6M-row hard-convergence
regime, df32, on a TPU v5e.

    python scripts/plot_curves.py        # rewrites the PNG in place
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "docs", "data")
OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "residual_hard1601k.png")

# categorical slots in fixed order (validated reference palette,
# light mode) — color follows the entity, never its rank
SERIES = [
    ("bicgstab", "BiCGStab", "#2a78d6"),
    ("ca_bicgstab", "CA-BiCGStab", "#eb6834"),
    ("pipe_bicgstab", "pipelined", "#1baf7a"),
    ("pipe_bicgstab_rr", "pipelined + RR", "#eda100"),
]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"


def main():
    fig, ax = plt.subplots(figsize=(7.6, 4.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    for key, label, color in SERIES:
        path = os.path.join(DATA, f"r2_hard1601k_df32_{key}.csv")
        d = np.loadtxt(path, delimiter=",", skiprows=1)
        ax.semilogy(d[:, 0], d[:, 1], color=color, linewidth=1.6,
                    label=label, solid_capstyle="round")

    ax.set_xlabel("iteration", color=INK2, fontsize=9)
    ax.set_ylabel("relative residual (estimate)", color=INK2, fontsize=9)
    ax.set_title("Hard-regime convergence — 1.6M rows, 13-diagonal "
                 "Transport profile (transport_hard), df32, TPU v5e",
                 color=INK, fontsize=10, loc="left", pad=10)
    ax.grid(True, which="major", color="#e8e7e3", linewidth=0.6)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)

    # the story the reference's plot tells, annotated in ink (not
    # series color): the pipelined recurrence stagnates; RR repairs it
    ax.annotate("pipelined stagnates ~8e-10", xy=(5400, 1.2e-9),
                fontsize=8, color=INK2)
    ax.annotate("RR recovers to 7e-15", xy=(4175, 2.5e-14),
                fontsize=8, color=INK2)

    leg = ax.legend(loc="upper right", fontsize=8, frameon=False)
    for t in leg.get_texts():
        t.set_color(INK2)

    fig.tight_layout()
    fig.savefig(OUT, facecolor=SURFACE)
    print(f"wrote {os.path.relpath(OUT)}")


if __name__ == "__main__":
    main()
