"""Wall-clock and per-phase timing.

The reference hand-rolls section timers behind MEASURE_TIME /
MEASURE_SECTION_TIME compile flags (solver.c:6,129-140;
shifted_switching_solver.c:9,338-342,994-1005). Here timing is a small
runtime utility; device work is fenced with block_until_ready, which plays
the role MPI_Wtime + implicit synchronization played in the reference.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


def _sync(x):
    try:
        jax.block_until_ready(x)
    except Exception:
        pass
    return x


class Timer:
    """Simple fenced wall-clock timer (reference MPI_Wtime, solver.c:70,130)."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None):
        if result is not None:
            _sync(result)
        self.elapsed += time.perf_counter() - self._t0
        return self.elapsed


class PhaseTimer:
    """Accumulating per-phase timer (reference MEASURE_SECTION_TIME,
    shifted_switching_solver.c:678-695,884-892).

    Usage::

        pt = PhaseTimer()
        with pt.phase("spmv"):
            y = spmv(x); jax.block_until_ready(y)
        pt.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def csv_row(self):
        keys = sorted(self.totals)
        return ",".join(f"{self.totals[k]:.6e}" for k in keys), keys

    def report(self, println=print):
        for k in sorted(self.totals):
            println(
                f"{k:>16s}: total {self.totals[k]:.6e} s, "
                f"calls {self.counts[k]}, avg {self.totals[k] / max(1, self.counts[k]):.6e} s"
            )
