#!/usr/bin/env python
"""Round-4 probe 2: (a) empirical pure-read HBM rate at the DIA vals
shape — settles whether the 189 Gnnz/s SpMV headline's implied
bandwidth is physical (the 694 GB/s 'measured' anchor came from an
fma15 READ+WRITE chain; a pure streaming read can run closer to the
819 GB/s spec); (b) the batched-8 DIA SpMV kernel alone, to see how
much of the 2.79 ms batched iteration is SpMV vs XLA body."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mpi_bicgstab_tpu.benchmarks.runner import _slope_time
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.models.problem import build_problem

    n = 1_602_112
    csr = transport_like(n)
    prob = build_problem(csr, dtype=jnp.float32, multiple=1024)
    A = prob.A
    vals = A.vals                      # [W, n] f32
    out = {"n": n, "nnz": csr.nnz,
           "vals_MB": round(vals.size * 4 / 1e6, 1)}

    # (a) pure read: sum the whole vals array per iteration; the carry
    # folds the scalar back so XLA cannot hoist the reduce
    def make_read(K):
        @jax.jit
        def run(s0):
            def body(i, s):
                return jnp.sum(vals) * 1e-30 + s * 0.5

            return lax.fori_loop(0, K, body, s0)

        s0 = jnp.float32(1.0)
        return lambda: run(s0)

    sec = _slope_time(make_read, K1=40, K2=480, reps=5)
    out["read_s_per_pass"] = round(sec, 6)
    out["read_GBps"] = round(vals.size * 4 / sec / 1e9, 1)
    print(json.dumps(out), flush=True)

    # read+write: y = vals * c (96 MB read + 96 MB write per pass)
    def make_rw(K):
        @jax.jit
        def run(v):
            def body(i, v):
                return v * (1.0 - 1e-7)

            return lax.fori_loop(0, K, body, v)

        return lambda: jnp.sum(run(vals)[0, :8])

    sec = _slope_time(make_rw, K1=40, K2=480, reps=5)
    out["rw_s_per_pass"] = round(sec, 6)
    out["rw_GBps"] = round(2 * vals.size * 4 / sec / 1e9, 1)
    print(json.dumps(out), flush=True)

    # (b) batched-8 SpMV kernel alone
    from mpi_bicgstab_tpu.ops.pallas_batched_spmv import batched_dia_spmv
    k = 8
    n_op = vals.shape[1]           # operator's own padded width
    n_pad = -(-n_op // 8192) * 8192
    vals_p = jnp.pad(vals, ((0, 0), (0, n_pad - n_op)))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((k, n_pad)), jnp.float32)

    def make_b(K):
        @jax.jit
        def run(Xs):
            def body(i, Xs):
                Y = batched_dia_spmv(vals_p, Xs, A.offsets)
                return Y * (1.0 / (1.0 + jnp.sum(jnp.abs(Y[:, :128]))))

            return jnp.sum(lax.fori_loop(0, K, body, Xs)[:, :8])

        return lambda: run(X)

    sec = _slope_time(make_b, K1=10, K2=60, reps=5)
    out["batched8_spmv_s"] = round(sec, 6)
    out["batched8_spmv_nnz_per_s"] = round(k * csr.nnz / sec, 1)
    # traffic model: vals once + k x (x windows + y)
    bytes_model = vals.size * 4 + k * 2 * n_pad * 4
    out["batched8_spmv_implied_GBps"] = round(bytes_model / sec / 1e9, 1)
    print(json.dumps(out), flush=True)

    # single-lane comparison: the plain DIA kernel at the same shape
    from mpi_bicgstab_tpu.ops.layout import spmv as generic_spmv
    x1 = X[0, :A.n_rows]

    def make_s(K):
        @jax.jit
        def run(v):
            def body(i, v):
                y = generic_spmv(A, v)
                return y / (1.0 + jnp.sum(jnp.abs(y)))

            return jnp.sum(lax.fori_loop(0, K, body, v))

        return lambda: run(x1)

    sec = _slope_time(make_s, K1=20, K2=120, reps=5)
    out["single_spmv_s"] = round(sec, 6)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
