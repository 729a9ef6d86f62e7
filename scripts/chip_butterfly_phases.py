#!/usr/bin/env python
"""Phase-level slope timing of the butterfly-routed SpMV pipeline.

The full pipeline (ops/pallas_butterfly._pipeline) is
    pad -> K1 -> T1 -> K2 -> T2 -> K3 -> (+ leveled tail)
and the >=4 Gnnz/s uniform-random target (round-2 VERDICT missing #1)
depends on every phase holding its measured primitive rate
(scripts/probe_shuffle.py: gathers ~14-16 Gelem/s, transposes
~806 GB/s). If the end-to-end number misses, this script says which
phase ate the budget.

Each phase is timed with the same slope methodology as
benchmarks/runner.py (two chain lengths inside one jit; the relay's
~33 ms sync overhead cancels): the phase runs in a lax.fori_loop whose
carry feeds the next iteration, so XLA cannot hoist it; Pallas calls
are opaque to algebraic simplification, and transposes feed their full
output into the carry.

Usage:  python scripts/chip_butterfly_phases.py [n_rows] [--interpret]
        (default n_rows=200704; --interpret = tiny CPU smoke test)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpi_bicgstab_tpu.benchmarks.runner import _slope_time  # noqa: E402


def _slope(make_chain, K1, K2):
    """One methodology everywhere: runner._slope_time (interleaved
    two-chain median-of-positive-slopes; tests/test_bench.py pins it)."""
    return _slope_time(make_chain, K1=K1, K2=K2)


def main():
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mpi_bicgstab_tpu.models.generators import random_diag_dominant
    from mpi_bicgstab_tpu.ops import pallas_butterfly as PB
    from mpi_bicgstab_tpu.ops.butterfly import (_B, _LANES, _SUB,
                                                build_butterfly)

    interpret = "--interpret" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else (4096 if interpret else 200_704)
    K1, K2 = (2, 4) if interpret else (8, 40)

    csr = random_diag_dominant(n, nnz_per_row=8, seed=0)
    t0 = time.perf_counter()
    bf = build_butterfly(csr)
    build_s = time.perf_counter() - t0
    P, NR = bf.P, bf.n_pad // _LANES
    NCR = bf.nc_pad // _LANES
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(csr.nrows), jnp.float32)
    xp = jnp.zeros((bf.nc_pad,), jnp.float32).at[: bf.n_cols].set(
        x[: bf.n_cols])
    x2d = xp.reshape(NCR, _LANES)

    def chain(body, v0):
        def make(K):
            @jax.jit
            def run(v):
                out = lax.fori_loop(0, K, body, v)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf[:1])

            return lambda: run(v0)

        return make

    res = {"n": n, "nnz": csr.nnz, "P": P, "stack": bf.stack,
           "tail_n": int(bf.tail_n), "route_build_s": round(build_s, 2)}

    # --- full pipeline ------------------------------------------------
    def full_body(i, v):
        y = PB.butterfly_spmv(bf, v, interpret=interpret)
        return v / (1.0 + jnp.abs(jnp.sum(y[:_LANES])))

    res["full_s"] = _slope(chain(full_body, x), K1, K2)

    # --- K1: gather from the resident iterate --------------------------
    def k1_body(i, v):
        u1 = PB._k1(bf.k1_src, bf.k1_sub, bf.k1_lane, v,
                    interpret=interpret)
        return v / (1.0 + jnp.abs(jnp.sum(u1[0, 0, :8])))

    res["k1_s"] = _slope(chain(k1_body, x2d), K1, K2)

    # --- T1/T2: the element transpose (same shape both times) ----------
    u1_0 = PB._k1(bf.k1_src, bf.k1_sub, bf.k1_lane, x2d,
                  interpret=interpret)

    def t_body(i, v):
        return v.reshape(P, _B).T.reshape(P, _SUB, _LANES) * 0.999999

    res["t_each_s"] = _slope(chain(t_body, u1_0), K1, K2)

    # --- K2: within-window permute of the streamed buffer --------------
    def k2_body(i, v):
        return PB._k2(v, bf.k2_sub, bf.k2_lane, interpret=interpret)

    res["k2_s"] = _slope(chain(k2_body, u1_0), K1, K2)

    # --- K3: gather + multiply + accumulate -----------------------------
    z0 = u1_0.reshape(P, _B).T.reshape(P * _SUB, _LANES)

    def k3_body(i, v):
        y = PB._k3(v, bf.k3_sub, bf.k3_lane, bf.k3_vals, F=bf.stack,
                   interpret=interpret)
        return v / (1.0 + jnp.abs(jnp.sum(y[:_LANES])))

    res["k3_s"] = _slope(chain(k3_body, z0), K1, K2)

    # --- tail: leveled segment-sum spill -------------------------------
    if bf.tail_n:
        def tail_body(i, v):
            t = (bf.tail_vals * v[bf.tail_cols]).reshape(-1)
            y = jax.ops.segment_sum(t, bf.tail_rows.reshape(-1),
                                    num_segments=bf.n_pad)
            return v / (1.0 + jnp.abs(jnp.sum(y[:_LANES])))

        res["tail_s"] = _slope(chain(tail_body, xp), K1, K2)

    phases = [k for k in ("k1_s", "t_each_s", "k2_s", "k3_s", "tail_s")
              if k in res]
    acct = sum(res[k] * (2 if k == "t_each_s" else 1) for k in phases)
    res["phase_sum_s"] = acct
    res["unaccounted_s"] = res["full_s"] - acct
    res["full_nnz_per_s"] = csr.nnz / res["full_s"]
    for k in ("full_s", "k1_s", "t_each_s", "k2_s", "k3_s", "tail_s",
              "phase_sum_s", "unaccounted_s"):
        if k in res:
            res[k] = float(f"{res[k]:.3e}")
    res["full_nnz_per_s"] = round(res["full_nnz_per_s"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
