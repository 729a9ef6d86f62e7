#!/usr/bin/env python
"""Round-4 windowed-ELL bisect: reproduce BENCH_r03's 4.28 Gnnz/s at
1.6M (VERDICT r3 weak #2: docs advertise 15.5 Gnnz/s there, round-2
bench recorded 7.2 at 200k). Sweeps size x layout on the real chip and
prints one JSON line per measurement, so the regression can be
attributed to (a) scale, (b) auto-selection, (c) the kernel itself,
or (d) a stale layout-cache entry."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    os.environ.setdefault("MBT_LAYOUT_CACHE", os.path.join(
        os.path.expanduser("~"), ".cache", "mpi_bicgstab_tpu",
        "layouts"))
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mpi_bicgstab_tpu.benchmarks.runner import _slope_time
    from mpi_bicgstab_tpu.models.generators import clustered_random
    from mpi_bicgstab_tpu.ops.layout import build_operator
    from mpi_bicgstab_tpu.ops.layout import spmv as generic_spmv

    sizes = [200_704, 401_408, 802_816, 1_602_560]
    if "--quick" in sys.argv:
        sizes = [200_704, 1_602_560]
    rng = np.random.default_rng(0)
    for n in sizes:
        t0 = time.perf_counter()
        csr = clustered_random(n)
        gen_s = time.perf_counter() - t0
        for fmt in ("window",):
            t0 = time.perf_counter()
            A = build_operator(csr, format=fmt, dtype=jnp.float32)
            build_s = time.perf_counter() - t0
            x0 = jnp.asarray(rng.standard_normal(A.n_rows),
                             dtype=jnp.float32)

            def make_chain(K):
                @jax.jit
                def chain(v):
                    def body(i, v):
                        y = generic_spmv(A, v)
                        return y / (1.0 + jnp.sum(jnp.abs(y)))

                    return jnp.sum(lax.fori_loop(0, K, body, v))

                return lambda: chain(x0)

            sec = _slope_time(make_chain, K1=20, K2=120, reps=3)
            print(json.dumps({
                "n": n, "nnz": csr.nnz, "layout": type(A).__name__,
                "width": int(getattr(A, "width", 0)),
                "nnz_per_s": round(csr.nnz / sec, 1),
                "gnnz_per_s": round(csr.nnz / sec / 1e9, 2),
                "spmv_s": round(sec, 6), "gen_s": round(gen_s, 1),
                "build_s": round(build_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
