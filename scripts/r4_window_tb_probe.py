#!/usr/bin/env python
"""Round-4: TB sweep for the windowed-ELL kernel at the headline shape
(clustered_random 1.6M). The butterfly K2 kernel gained 2.2x going
TB 16 -> 256; this kernel has the same [TB,8,128]-block grid but
carries W vals/idx slabs per tile, so VMEM caps TB lower. Sweeps by
monkeypatching the module _TB."""
import json
import os
import sys

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
    from mpi_bicgstab_tpu.ops import pallas_window_spmv as PW
    from mpi_bicgstab_tpu.ops.layout import build_operator
    window_spmv = PW.window_spmv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_602_560
    csr = clustered_random(n)
    A = build_operator(csr, format="window", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A.n_rows), jnp.float32)
    out = {"n": n, "nnz": csr.nnz, "width": int(A.width)}

    ref = None
    for tb in (16, 32, 64):
        PW._TB = tb
        PW._window_spmv_core.clear_cache()

        def make(K):
            @jax.jit
            def run(v):
                def body(i, v):
                    y = window_spmv(A, v)
                    return y / (1.0 + jnp.abs(jnp.sum(y[:128])))

                return jnp.sum(lax.fori_loop(0, K, body, v))

            return lambda: run(x)

        try:
            y0 = np.asarray(window_spmv(A, x))
            if ref is None:
                ref = y0
            else:
                assert np.array_equal(ref, y0), "TB changed the result"
            sec = _slope_time(make, K1=8, K2=40, reps=5)
            out[f"tb{tb}_s"] = round(sec, 7)
            out[f"tb{tb}_gnnz"] = round(csr.nnz / sec / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            out[f"tb{tb}_error"] = repr(e)[:150]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
