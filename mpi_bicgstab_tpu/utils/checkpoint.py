"""Checkpoint / resume for long solves.

The reference has none (SURVEY §5: any failure aborts the whole PJM
job; solves run to completion in one allocation). For production runs
on preemptible TPU slices that is not acceptable, so the framework
checkpoints the solver ITERATE: a BiCGStab restart from the current x
(x0 = x_checkpoint, r recomputed as b - A x0) is mathematically exact —
the Krylov space is rebuilt, costing a handful of extra iterations, in
exchange for a checkpoint that is one vector instead of the full
recurrence state, valid across solver variants, dtypes, device counts,
and code versions.

CLASSIC FAMILY ONLY: the shifted solvers derive every shift from one
Krylov sequence with x0 = 0, and restarting from a nonzero x_set breaks
the residual-collinearity assumption the recurrences stand on — so no
checkpoint hooks are offered there.

Format: a single .npz with the iterate, iteration counter, and metadata
for sanity checks on resume. DF (double-float) iterates store their
full f64 value so df32 runs resume losslessly.
"""
from __future__ import annotations

import json
import os
import tempfile

import numpy as np

_FORMAT = 1


def _to_host(x):
    from mpi_bicgstab_tpu.ops.precision import df_to_f64, is_df
    if is_df(x):
        return {"df": df_to_f64(x)}
    return {"arr": np.asarray(x)}


def save_checkpoint(path: str, x, n_iter_done: int, meta: dict):
    """Atomically write the solver iterate + metadata.

    x: the current solution iterate [n]; jax array or DF pair."""
    payload = _to_host(x)
    kind, data = next(iter(payload.items()))
    header = dict(format=_FORMAT, kind=kind, n_iter_done=int(n_iter_done),
                  **meta)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, x=data, header=json.dumps(header))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, expect: dict | None = None):
    """Returns (x_host_f64, n_iter_done, header) or None if absent.

    expect: metadata keys that must match (e.g. matrix shape / method);
    a mismatch raises instead of silently resuming the wrong run."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["header"]))
        x = z["x"]
    if header.get("format") != _FORMAT:
        raise ValueError(f"unknown checkpoint format in {path}")
    for k, v in (expect or {}).items():
        if header.get(k) != v:
            raise ValueError(
                f"checkpoint {path} was written for {k}={header.get(k)!r}, "
                f"refusing to resume a run with {k}={v!r}")
    return x, int(header["n_iter_done"]), header


def solve_with_checkpoints(runner, path: str, segment_iters: int,
                           max_iter: int, meta: dict, tol: float,
                           x_key: str = "x"):
    """Run `runner(x0_host | None, iters_budget, tol_segment)` in
    segments, saving the iterate after each one; resumes from `path`
    when it exists.

    Tolerance bookkeeping: each restarted segment measures its residual
    relative to ITS OWN r0 = b - A x0, so the original stopping rule
    (relative to ||b||, since the original x0 is 0) is preserved by
    scaling: tol_segment = tol / prod(previous segments' final relres).
    The running product is stored in the checkpoint, so a resumed
    process keeps the original criterion.

    runner returns a result object with `.n_iter`, `.converged`,
    `.final_relres`, and the iterate under `x_key`. Returns
    (final_result | None, total_iters, cum_relres) where cum_relres is
    the residual relative to the ORIGINAL ||b|| (the quantity the
    un-checkpointed solve reports); result is None when the checkpoint
    alone already satisfies the run (converged or out of budget)."""
    resumed = load_checkpoint(path, expect=meta)
    x0 = None
    done = 0
    cum_rel = 1.0
    if resumed is not None:
        x0, done, header = resumed
        cum_rel = float(header.get("cum_rel", 1.0))
    res = None
    while done < max_iter and cum_rel > tol:
        budget = min(segment_iters, max_iter - done)
        tol_seg = min(tol / max(cum_rel, 1e-300), 0.5)
        res = runner(x0, budget, tol_seg)
        done += int(res.n_iter)
        # propagate breakdowns honestly: NaN (solver blew up) and 0.0
        # (exact convergence) both belong in the cumulative residual
        cum_rel *= float(res.final_relres)
        x = getattr(res, x_key)
        save_checkpoint(path, x, done, dict(meta, cum_rel=cum_rel))
        if bool(res.converged) or int(res.n_iter) < budget:
            break
        from mpi_bicgstab_tpu.ops.precision import df_to_f64, is_df
        x0 = df_to_f64(x) if is_df(x) else np.asarray(x)
    return res, done, cum_rel
