#!/usr/bin/env python
"""Round-4 gather probe 3: K2 TB knee (256/512), K3 take16 with
(16,128)-padded index tables (Mosaic gather needs indices shaped like
the input; compute 16 output rows, keep 8), K3 lane-first ordering."""
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SUB, _LANES = 8, 128


def main():
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpi_bicgstab_tpu.benchmarks.runner import _slope_time

    P = 25_600
    rng = np.random.default_rng(0)
    mid = jnp.asarray(rng.standard_normal((P, 8, 128)), jnp.float32)
    ss = jnp.asarray(rng.integers(0, 8, (P, 8, 128)), jnp.int8)
    li = jnp.asarray(rng.integers(0, 128, (P, 8, 128)), jnp.int8)
    out = {}

    def bench(fn, v0, K1=8, K2=40):
        def make(K):
            @jax.jit
            def run(v):
                def body(i, v):
                    o = fn(v)
                    return v / (1.0 + jnp.abs(jnp.sum(o[0, 0, :8])))

                return jnp.sum(lax.fori_loop(0, K, body, v)[0])

            return lambda: run(v0)

        return _slope_time(make, K1=K1, K2=K2, reps=5)

    def k2_call(kernel, TB):
        def f(m):
            tile = lambda: pl.BlockSpec(  # noqa: E731
                (TB, _SUB, _LANES), lambda s: (s, 0, 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                partial(kernel, TB=TB),
                grid=(P // TB,),
                in_specs=[tile(), tile(), tile()],
                out_specs=tile(),
                out_shape=jax.ShapeDtypeStruct((P, _SUB, _LANES),
                                               m.dtype),
            )(m, ss, li)

        return f

    def k2_base_kernel(m_ref, ss_ref, li_ref, o_ref, *, TB):
        for tb in range(TB):
            win = m_ref[tb]
            s = ss_ref[tb].astype(jnp.int32)
            l = li_ref[tb].astype(jnp.int32)  # noqa: E741
            t1 = jnp.take_along_axis(win, s, axis=0)
            o_ref[tb] = jnp.take_along_axis(t1, l, axis=1)

    for TB in (256, 512):
        try:
            sec = bench(k2_call(k2_base_kernel, TB), mid)
            out[f"k2_tb{TB}_s"] = round(sec, 7)
        except Exception as e:  # noqa: BLE001
            out[f"k2_tb{TB}_error"] = repr(e)[:120]
        print(json.dumps(out), flush=True)

    # ---- K3 take16: (16,128) padded index tables --------------------
    NR = 12_520
    F = 2
    C = 2
    SF = _SUB * F
    z = jnp.asarray(rng.standard_normal((NR * SF, _LANES)), jnp.float32)
    # tables shaped (C, 16, NR, 128): rows 8:16 are don't-care copies
    ss16 = jnp.asarray(rng.integers(0, 16, (C, SF, NR, _LANES)),
                       jnp.int8)
    li3 = jnp.asarray(rng.integers(0, 128, (C, _SUB, NR, _LANES)),
                      jnp.int8)
    v3 = jnp.asarray(rng.standard_normal((C, _SUB, NR, _LANES)),
                     jnp.float32)

    def k3_call16(kernel, TB):
        def f(zz):
            t8 = lambda: pl.BlockSpec(  # noqa: E731
                (C, _SUB, TB, _LANES), lambda s: (0, 0, s, 0),
                memory_space=pltpu.VMEM)
            t16 = lambda: pl.BlockSpec(  # noqa: E731
                (C, SF, TB, _LANES), lambda s: (0, 0, s, 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                partial(kernel, C=C, F=F, TB=TB),
                grid=(NR // TB,),
                in_specs=[pl.BlockSpec((TB * SF, _LANES),
                                       lambda s: (s, 0),
                                       memory_space=pltpu.VMEM),
                          t16(), t8(), t8()],
                out_specs=pl.BlockSpec((TB, _LANES), lambda s: (s, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NR, _LANES),
                                               jnp.float32),
            )(zz, ss16, li3, v3)

        return f

    def bench3(fn, K1=8, K2=40):
        def make(K):
            @jax.jit
            def run(v):
                def body(i, v):
                    y = fn(v)
                    return v / (1.0 + jnp.abs(jnp.sum(y[0, :8])))

                return jnp.sum(lax.fori_loop(0, K, body, v)[0, :8])

            return lambda: run(z)

        return _slope_time(make, K1=K1, K2=K2, reps=5)

    def k3_take16_kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *,
                         C, F, TB):
        for tb in range(TB):
            stacked = z_ref[pl.ds(tb * SF, SF), :]
            acc = jnp.zeros((_SUB, _LANES), jnp.float32)
            for c in range(C):
                s16 = ss_ref[c, :, tb].astype(jnp.int32)
                l = li_ref[c, :, tb].astype(jnp.int32)  # noqa: E741
                g16 = jnp.take_along_axis(stacked, s16, axis=0)
                xg = jnp.take_along_axis(g16[0:_SUB], l, axis=1)
                acc = acc + v_ref[c, :, tb] * xg
            y_ref[tb] = jnp.sum(acc, axis=0)

    for TB in (16, 40):
        try:
            sec = bench3(k3_call16(k3_take16_kernel, TB))
            out[f"k3_take16_tb{TB}_s"] = round(sec, 7)
        except Exception as e:  # noqa: BLE001
            out[f"k3_take16_tb{TB}_error"] = repr(e)[:200]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
