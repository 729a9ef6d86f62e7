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

Two mechanisms:

* Classic family — ITERATE checkpoint (save_checkpoint/load_checkpoint/
  solve_with_checkpoints): restart from x0 = x_checkpoint rebuilds the
  Krylov space exactly; one vector, valid across variants/dtypes/device
  counts. NOT applicable to the shifted family: its recurrences require
  x0 = 0 for every shift (residual collinearity).

* Seed-switching shifted solver — FULL-CARRY checkpoint (save_carry/
  load_carry/solve_switching_with_checkpoints): the solver's entire
  while_loop carry (x_set, p_set, r, scalar archives, stop flags, seed)
  is a pytree of device arrays; serializing it and resuming via
  solvers.switching.shifted_lopbicg_switching_segment reproduces the
  uninterrupted solve BIT-EXACTLY (tests/test_checkpoint.py asserts
  equality), at the cost of a state-shaped (not vector-shaped) file.

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


def _atomic_savez(path: str, **arrays):
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_carry(path: str, carry, meta: dict):
    """Atomically serialize a solver while_loop carry (any pytree of
    arrays / DF pairs) — the full-state checkpoint of the seed-switching
    shifted solver."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    header = dict(format=2, kind="carry", n_leaves=len(leaves),
                  treedef=str(treedef), **meta)
    arrays = {f"leaf_{i}": np.asarray(leaf)
              for i, leaf in enumerate(leaves)}
    _atomic_savez(path, header=json.dumps(header), **arrays)


def load_carry(path: str, template, expect: dict | None = None):
    """Returns the carry pytree (device arrays, structure taken from
    `template` — e.g. solvers.switching.init_switching_carry(...)), or
    None if the file is absent. Raises on any metadata / structure /
    shape / dtype mismatch rather than resuming the wrong run."""
    import jax
    import jax.numpy as jnp
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["header"]))
        saved = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]
    if header.get("format") != 2 or header.get("kind") != "carry":
        raise ValueError(f"{path} is not a carry checkpoint")
    for k, v in (expect or {}).items():
        if header.get(k) != v:
            raise ValueError(
                f"carry checkpoint {path} was written for "
                f"{k}={header.get(k)!r}, refusing to resume a run with "
                f"{k}={v!r}")
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    if header["treedef"] != str(treedef) or \
            len(saved) != len(leaves_t):
        raise ValueError(f"carry checkpoint {path} has a different "
                         "solver-state structure (solver version or "
                         "configuration changed)")
    out = []
    for i, (s, t) in enumerate(zip(saved, leaves_t)):
        if s.shape != t.shape or s.dtype != np.asarray(t).dtype:
            raise ValueError(
                f"carry leaf {i}: checkpoint has {s.shape}/{s.dtype}, "
                f"solver expects {t.shape}/{np.asarray(t).dtype}")
        out.append(jnp.asarray(s))
    return jax.tree_util.tree_unflatten(treedef, out)


def solve_switching_with_checkpoints(segment_runner, init_carry, path: str,
                                     segment_iters: int, max_iter: int,
                                     meta: dict):
    """Run the seed-switching solver in segments of `segment_iters`
    iterations, saving the FULL carry after each; resumes from `path`
    when present. segment_runner(carry, k_stop) -> (ShiftedResult,
    carry). The segmented run is bit-identical to an uninterrupted one.

    Returns (result, total_iters)."""
    from mpi_bicgstab_tpu.solvers.switching import carry_k, carry_stop_flags
    if segment_iters < 1:
        raise ValueError("segment_iters must be >= 1")
    carry = load_carry(path, init_carry, expect=meta)
    if carry is None:
        carry = init_carry
    res = None
    while True:
        k = int(np.asarray(carry_k(carry)))     # next iteration index
        done = k - 1                            # :559 reports k-1
        all_stopped = bool(np.asarray(carry_stop_flags(carry)).all())
        if all_stopped or done >= max_iter:
            if res is None:
                # checkpoint alone satisfies the run: produce the result
                # with a zero-length segment
                res, carry = segment_runner(carry, k)
            break
        res, carry = segment_runner(carry, k + segment_iters)
        save_carry(path, carry, meta)
    return res, int(np.asarray(carry_k(carry))) - 1


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
    if segment_iters < 1:
        raise ValueError("segment_iters must be >= 1")
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
