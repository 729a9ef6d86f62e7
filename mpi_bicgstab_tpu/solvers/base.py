"""Result containers shared by all solver families."""
from __future__ import annotations

import dataclasses
from functools import partial

import jax


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "n_iter", "final_relres", "history", "converged",
                      "true_relres"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Result of a classic-family solve.

    x:            solution vector (local shard when distributed)
    n_iter:       iterations executed (reference return value, solver.c:145)
    final_relres: sqrt(dot_r / dot_zero) — the reference's "Final r"
                  print (solver.c:136). This is the *recursive* residual,
                  not the true residual (SURVEY quirk #4).
    history:      [max_iter] per-iteration relative residuals (NaN beyond
                  n_iter) — the data behind doc/residual_result.png.
    converged:    recursive test (dot_r <= tol^2 * dot_zero at exit) AND
                  true_relres <= 100 * tol. The reference trusts the
                  recursive residual alone (quirk #4) — but the pipelined
                  recurrences can DECOUPLE from the true residual on
                  near-breakdown systems (measured: est 1e-16 with true
                  6e-2 on a cond-5.9 matrix), so convergence here is
                  gated on one extra SpMV at exit. The 100x margin
                  absorbs the legitimate recursive/true gap near machine
                  precision without passing decoupled exits (those are
                  many orders apart).
    true_relres:  ||b - A x|| / ||r0|| computed at exit.
    """

    x: jax.Array
    n_iter: jax.Array
    final_relres: jax.Array
    history: jax.Array
    converged: jax.Array
    true_relres: jax.Array


@partial(jax.tree_util.register_dataclass,
         data_fields=["x_set", "n_iter", "final_relres", "history",
                      "stop_flags", "final_seed", "shift_relres",
                      "true_relres"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ShiftedResult:
    """Result of a shifted-family solve.

    x_set:        [n_sigma, n] solutions of (A + sigma_j I) x_j = b
    final_relres: seed-system recursive relative residual at exit
    history:      [max_iter] seed relative-residual history
    stop_flags:   [n_sigma] per-shift converged flags (switching family;
                  all-True <=> every shift hit tolerance)
    final_seed:   seed index at exit (changes under seed switching)
    shift_relres: [n_sigma] ESTIMATED per-shift relative residuals at
                  exit — |scale_j| * ||r_seed|| / ||r0||, the quantity
                  the reference prints under DISPLAY_SIGMA_RESIDUAL
                  (shifted_switching_solver.c:447-478); estimated, never
                  recomputed (SURVEY quirk #5)
    true_relres:  ||b - (A + sigma_seed I) x_seed|| / ||r0|| of the
                  CURRENT seed system, one extra SpMV at exit. Every
                  per-shift estimate is |scale_j| times the seed
                  residual, so a seed recurrence that decoupled from
                  the truth poisons the whole ladder silently — this
                  field is the detector (per-shift truth itself is
                  validated by `refine`/`--check-error`).
    """

    x_set: jax.Array
    n_iter: jax.Array
    final_relres: jax.Array
    history: jax.Array
    stop_flags: jax.Array
    final_seed: jax.Array
    shift_relres: jax.Array
    true_relres: jax.Array


def exact_iters(cfg) -> bool:
    """True when cfg.tol == 0.0 — the BENCHMARK contract: run EXACTLY
    max_iter iterations with no residual-based exit.

    Why this must be explicit (round-3 bench fix): the solvers' loop
    condition is `dot_r > tol^2 * dot_zero`, which with tol = 0 reads
    `dot_r > 0`. Once an easy system converges past the f32 floor the
    recurrences break down and dot_r becomes NaN (or exactly 0.0), and
    `NaN > 0` is False — the loop exits EARLY at a data-dependent
    iteration, silently truncating tol=0 slope timings (measured: the
    classic chain at max_iter=120 exited at ~24, making the two-point
    slope pure noise — an impossible 19 us/iter landed in the bench
    JSON). Decided at trace time: cfg.tol is static under jit."""
    return float(getattr(cfg, "tol", 1.0)) == 0.0
