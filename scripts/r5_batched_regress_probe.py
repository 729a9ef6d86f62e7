"""Localize the batched-8 regression (round 5): round-4 recorded
1.45 ms/iter for the fully-fused batched-8 classic iteration at 1.6M
(docs/RESULTS_TPU.md round-4 table); the round-5 bench measures
~3.2 ms through api.solve_batched. Batched kernel + solver code is
unchanged since the claim (git diff 91ee9f5..HEAD), so time each
piece: the three fused kernels alone, the while_loop body via
solve_batched at tol=0, and the single-lane fused iteration anchor.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpi_bicgstab_tpu.models.generators import transport_like
from mpi_bicgstab_tpu.models.problem import build_problem


def med_time(fn, reps=7):
    fn()  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    out = {}
    csr = transport_like(1_602_112)
    prob = build_problem(csr, dtype="float32", multiple=1024)
    A = prob.A
    k, n0 = 8, prob.n
    n = -(-n0 // 8192) * 8192
    vals = A.vals
    if n != n0:
        vals = jnp.pad(vals, ((0, 0), (0, n - n0)))
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    from mpi_bicgstab_tpu.ops.pallas_fused_batched import (fused_k1b,
                                                           fused_k2b,
                                                           fused_k3b)
    R = B
    P = B * 0.5
    S = B * 0.25
    Rh = B * 0.125
    X = B * 2.0
    sc1 = jnp.ones((3 * k,), jnp.float32)
    sc2 = jnp.ones((2 * k,), jnp.float32)
    sc3 = jnp.ones((3 * k,), jnp.float32)
    offs = A.offsets

    # arrays must be jit ARGUMENTS: closure capture embeds them as HLO
    # constants, which the remote compiler's request limit rejects
    k1 = jax.jit(lambda v, r, p, s, rh: fused_k1b(v, r, p, s, rh, sc1,
                                                  offs))
    k2 = jax.jit(lambda v, r, s: fused_k2b(v, r, s, sc2, offs))
    k3 = jax.jit(lambda x, p, r, s, rh: fused_k3b(x, p, r, s, rh, sc3))
    out["k1b_s"] = round(med_time(
        lambda: jax.block_until_ready(k1(vals, R, P, S, Rh))), 6)
    print("k1b", out["k1b_s"], flush=True)
    out["k2b_s"] = round(med_time(
        lambda: jax.block_until_ready(k2(vals, R, S))), 6)
    print("k2b", out["k2b_s"], flush=True)
    out["k3b_s"] = round(med_time(
        lambda: jax.block_until_ready(k3(X, P, R, S, Rh))), 6)
    print("k3b", out["k3b_s"], flush=True)
    out["phases_sum_s"] = round(
        out["k1b_s"] + out["k2b_s"] + out["k3b_s"], 6)

    # full loop via the api, tol=0 slope (what the bench records)
    from mpi_bicgstab_tpu.api import solve_batched
    from mpi_bicgstab_tpu.utils.config import SolverConfig

    B0 = jnp.asarray(rng.standard_normal((k, n0)), jnp.float32)

    def run(K):
        cfg = SolverConfig(tol=0.0, max_iter=K, dtype="float32",
                           restarts=0)
        r = solve_batched(A, B0, method="bicgstab", cfg=cfg)
        jax.block_until_ready(r.x)

    K1, K2 = 10, 60
    t1 = med_time(lambda: run(K1), reps=3)
    t2 = med_time(lambda: run(K2), reps=3)
    out["loop_per_iter_s"] = round((t2 - t1) / (K2 - K1), 6)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
