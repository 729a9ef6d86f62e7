#!/usr/bin/env python
"""Round-4 gather probe 2: TB sweep for K2/K3 (TB=32 won 33% on K2),
k3 take16 error capture, and K1 TB sweep."""
import json
import os
import sys
import traceback
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

    def k2_base_kernel(m_ref, ss_ref, li_ref, o_ref, *, TB):
        for tb in range(TB):
            win = m_ref[tb]
            s = ss_ref[tb].astype(jnp.int32)
            l = li_ref[tb].astype(jnp.int32)  # noqa: E741
            t1 = jnp.take_along_axis(win, s, axis=0)
            o_ref[tb] = jnp.take_along_axis(t1, l, axis=1)

    for TB in (32, 64, 128):
        try:
            sec = bench(k2_call(k2_base_kernel, TB), mid)
            out[f"k2_tb{TB}_s"] = round(sec, 7)
        except Exception as e:  # noqa: BLE001
            out[f"k2_tb{TB}_error"] = repr(e)[:150]
        print(json.dumps(out), flush=True)

    # ---- K3 --------------------------------------------------------
    NR = 12_520
    F = 2
    C = 2
    z = jnp.asarray(rng.standard_normal((NR * _SUB * F, _LANES)),
                    jnp.float32)
    ss3 = jnp.asarray(rng.integers(0, 16, (C, _SUB, NR, _LANES)),
                      jnp.int8)
    li3 = jnp.asarray(rng.integers(0, 128, (C, _SUB, NR, _LANES)),
                      jnp.int8)
    v3 = jnp.asarray(rng.standard_normal((C, _SUB, NR, _LANES)),
                     jnp.float32)

    def k3_call(kernel, TB):
        def f(zz):
            tile = lambda: pl.BlockSpec(  # noqa: E731
                (C, _SUB, TB, _LANES), lambda s: (0, 0, s, 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                partial(kernel, C=C, F=F, TB=TB),
                grid=(NR // TB,),
                in_specs=[pl.BlockSpec((TB * _SUB * F, _LANES),
                                       lambda s: (s, 0),
                                       memory_space=pltpu.VMEM),
                          tile(), tile(), tile()],
                out_specs=pl.BlockSpec((TB, _LANES), lambda s: (s, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NR, _LANES),
                                               jnp.float32),
            )(zz, ss3, li3, v3)

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

    def k3_base_kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *, C, F, TB):
        for tb in range(TB):
            stacked = z_ref[pl.ds(tb * _SUB * F, _SUB * F), :]
            acc = jnp.zeros((_SUB, _LANES), jnp.float32)
            for c in range(C):
                s = ss_ref[c, :, tb].astype(jnp.int32)
                l = li_ref[c, :, tb].astype(jnp.int32)  # noqa: E741
                g = jnp.take_along_axis(
                    stacked[0:_SUB, :], jnp.minimum(s, _SUB - 1),
                    axis=0)
                for f in range(1, F):
                    part = jnp.take_along_axis(
                        stacked[f * _SUB:(f + 1) * _SUB, :],
                        jnp.clip(s - f * _SUB, 0, _SUB - 1), axis=1
                        if False else 0)
                    g = jnp.where(s >= f * _SUB, part, g)
                xg = jnp.take_along_axis(g, l, axis=1)
                acc = acc + v_ref[c, :, tb] * xg
            y_ref[tb] = jnp.sum(acc, axis=0)

    for TB in (8, 32, 40):
        if NR % TB:
            continue
        try:
            sec = bench3(k3_call(k3_base_kernel, TB))
            out[f"k3_tb{TB}_s"] = round(sec, 7)
        except Exception as e:  # noqa: BLE001
            out[f"k3_tb{TB}_error"] = repr(e)[:150]
        print(json.dumps(out), flush=True)

    # take16 error capture
    def k3_take16_kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *,
                         C, F, TB):
        for tb in range(TB):
            stacked = z_ref[pl.ds(tb * _SUB * F, _SUB * F), :]
            acc = jnp.zeros((_SUB, _LANES), jnp.float32)
            for c in range(C):
                s = ss_ref[c, :, tb].astype(jnp.int32)
                l = li_ref[c, :, tb].astype(jnp.int32)  # noqa: E741
                g = jnp.take_along_axis(stacked, s, axis=0)
                xg = jnp.take_along_axis(g, l, axis=1)
                acc = acc + v_ref[c, :, tb] * xg
            y_ref[tb] = jnp.sum(acc, axis=0)

    try:
        sec = bench3(k3_call(k3_take16_kernel, 16))
        out["k3_take16_s"] = round(sec, 7)
    except Exception:  # noqa: BLE001
        out["k3_take16_error"] = traceback.format_exc()[-400:]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
