"""A/B the df32 DIA SpMV accumulation form on the chip (round 4).

The corrected roofline (docs/RESULTS_TPU.md round 4) showed dia_spmv_df
VPU-bound: 48 Gnnz/s = 435 GB/s implied vs ~740 GB/s achievable. This
probe times the old df_add(df_mul(...)) chain (~45 flops/term) against
the df_fma form (~27 flops/term) now used by ops/dia.dia_spmv_df, on
the bench-of-record transport_like operator, plus a max-abs-error
cross-check of both against the f64 host product.

Relay-friendly: every device computation is jitted, chain length k is
traced (one compile per variant, not per length), and the persistent
compile cache is on.

Usage: python scripts/r4_df_fma_spmv_ab.py [n]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_112
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    from mpi_bicgstab_tpu.models.generators import transport_like
    from mpi_bicgstab_tpu.ops.dia import (analyze_diagonals, csr_to_dia,
                                          dia_spmv_df)
    from mpi_bicgstab_tpu.ops.precision import (DF, df_add, df_mul,
                                                df_from_f64, df_to_f64,
                                                df_zeros)
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    csr = transport_like(n)
    offsets, _cov = analyze_diagonals(csr)
    A, rem = csr_to_dia(csr, offsets, dtype="df32")
    assert rem is None or rem.nnz == 0
    vals64 = df_to_f64(A.vals)
    nnz = int(np.count_nonzero(vals64))
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal(n)
    x = df_from_f64(x64)
    print(f"setup {time.perf_counter()-t0:.1f}s  n={n} nnz={nnz} "
          f"W={len(offsets)}", flush=True)

    def spmv_old(v):
        lo, hi = A.pad
        xp = DF(jnp.pad(v.hi, (lo, hi)), jnp.pad(v.lo, (lo, hi)))
        acc = df_zeros((A.n_rows,), v.hi.dtype)
        for w, o in enumerate(A.offsets):
            seg = DF(jax.lax.slice_in_dim(xp.hi, lo + o, lo + o + A.n_rows),
                     jax.lax.slice_in_dim(xp.lo, lo + o, lo + o + A.n_rows))
            acc = df_add(acc, df_mul(A.vals[w], seg))
        return acc

    def spmv_new(v):
        return dia_spmv_df(A, v)

    # f64 host reference on the DIA band
    lo, _hi = A.pad
    xp64 = np.pad(x64, (lo, A.pad[1]))
    y64 = np.zeros(n)
    for w, o in enumerate(A.offsets):
        y64 += vals64[w] * xp64[lo + o: lo + o + n]
    ymax = np.max(np.abs(y64))

    def make_chain(fn):
        @jax.jit
        def chain(v, k):
            def body(_, u):
                y = fn(u)
                return y * (1.0 / (1.0 + jnp.sum(jnp.abs(y.hi))))
            out = jax.lax.fori_loop(0, k, body, v,
                                    unroll=False)
            return jnp.sum(out.hi)
        return chain

    iters, reps = 60, 5
    for name, fn in (("old df_add(df_mul)", spmv_old),
                     ("new df_fma       ", spmv_new)):
        t0 = time.perf_counter()
        y = df_to_f64(jax.jit(fn)(x))
        rel = np.max(np.abs(y - y64)) / ymax
        print(f"{name}: max rel err vs f64 = {rel:.3e} "
              f"(compile+run {time.perf_counter()-t0:.1f}s)", flush=True)
        chain = make_chain(fn)
        chain(x, 8).block_until_ready()        # one compile, k traced
        chain(x, iters + 8).block_until_ready()
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            chain(x, 8).block_until_ready()
            t2 = time.perf_counter()
            chain(x, iters + 8).block_until_ready()
            t3 = time.perf_counter()
            ts.append(((t3 - t2) - (t2 - t1)) / iters)
        ts.sort()
        t = ts[len(ts) // 2]
        # the kernel streams ALL W*n band slots (explicit zeros
        # included), so bytes-actually-read uses W*n, not nnz —
        # nnz-based GB/s would understate traffic on partially
        # filled diagonals (round-4 ADVICE)
        slots = len(offsets) * n
        print(f"{name}: {t*1e6:8.1f} us/iter  {nnz/t/1e9:6.2f} Gnnz/s  "
              f"streamed {slots*8.0/t/1e9:6.1f} GB/s "
              f"({slots} slots x 8 B; fill {nnz/slots:.2f}) "
              f"[nnz-based: {nnz*8.0/t/1e9:6.1f} GB/s]",
              flush=True)


if __name__ == "__main__":
    main()
