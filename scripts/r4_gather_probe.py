#!/usr/bin/env python
"""Round-4 gather-kernel variants: K3 (1213 us/iter) and K2 (752 us)
dominate the butterfly SpMV's 3.12 ms at 1.6M (r4_butterfly_trace).
Both are take_along_axis-op bound, not stream bound (floors: 334 /
331 us). Variants measured here, K2-shaped ([P,8,128] windows, P=25600)
and K3-shaped (stacked (16,128) windows, NR=12520):

  k2_base    current kernel loop (per-tb takes)
  k2_batch   one batched take_along_axis over the (TB,8,128) block
  k2_tb32    TB=32 grid
  k3_base    current: 2 stacked parts + select chain, C=2
  k3_take16  direct take on the (16,128) stacked buffer (if Mosaic
             supports 16-sublane dynamic_gather, the F-chain dies)
  k3_batch   per-block batched takes

One JSON line accumulating results.
"""
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
    out = {"P": P}

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

    # --- k2 base (the production kernel body) -----------------------
    def k2_base_kernel(m_ref, ss_ref, li_ref, o_ref, *, TB):
        for tb in range(TB):
            win = m_ref[tb]
            s = ss_ref[tb].astype(jnp.int32)
            l = li_ref[tb].astype(jnp.int32)  # noqa: E741
            t1 = jnp.take_along_axis(win, s, axis=0)
            o_ref[tb] = jnp.take_along_axis(t1, l, axis=1)

    sec = bench(k2_call(k2_base_kernel, 16), mid)
    out["k2_base_s"] = round(sec, 7)
    print(json.dumps(out), flush=True)

    # --- k2 batched take over the block ------------------------------
    def k2_batch_kernel(m_ref, ss_ref, li_ref, o_ref, *, TB):
        blk = m_ref[...]
        s = ss_ref[...].astype(jnp.int32)
        l = li_ref[...].astype(jnp.int32)  # noqa: E741
        t1 = jnp.take_along_axis(blk, s, axis=1)
        o_ref[...] = jnp.take_along_axis(t1, l, axis=2)

    try:
        sec = bench(k2_call(k2_batch_kernel, 16), mid)
        out["k2_batch_s"] = round(sec, 7)
    except Exception as e:  # noqa: BLE001
        out["k2_batch_error"] = str(e)[:150]
    print(json.dumps(out), flush=True)

    # --- k2 TB=32 ----------------------------------------------------
    try:
        sec = bench(k2_call(k2_base_kernel, 32), mid)
        out["k2_tb32_s"] = round(sec, 7)
    except Exception as e:  # noqa: BLE001
        out["k2_tb32_error"] = str(e)[:150]
    print(json.dumps(out), flush=True)

    # ---- K3 shapes ---------------------------------------------------
    NR = 12_520
    TB = 16
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

    def k3_call(kernel):
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
                        jnp.clip(s - f * _SUB, 0, _SUB - 1), axis=0)
                    g = jnp.where(s >= f * _SUB, part, g)
                xg = jnp.take_along_axis(g, l, axis=1)
                acc = acc + v_ref[c, :, tb] * xg
            y_ref[tb] = jnp.sum(acc, axis=0)

    sec = bench3(k3_call(k3_base_kernel))
    out["k3_base_s"] = round(sec, 7)
    print(json.dumps(out), flush=True)

    # --- k3 with a DIRECT 16-sublane take ----------------------------
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
        sec = bench3(k3_call(k3_take16_kernel))
        out["k3_take16_s"] = round(sec, 7)
    except Exception as e:  # noqa: BLE001
        out["k3_take16_error"] = str(e)[:150]
    print(json.dumps(out), flush=True)

    # --- k3 batched over tb ------------------------------------------
    def k3_batch_kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *,
                        C, F, TB):
        blk = z_ref[...].reshape(TB, _SUB * F, _LANES)
        acc = jnp.zeros((TB, _SUB, _LANES), jnp.float32)
        for c in range(C):
            s = ss_ref[c].astype(jnp.int32).transpose(1, 0, 2)
            l = li_ref[c].astype(jnp.int32).transpose(1, 0, 2)  # noqa: E741
            g = jnp.take_along_axis(
                blk[:, 0:_SUB, :], jnp.minimum(s, _SUB - 1), axis=1)
            for f in range(1, F):
                part = jnp.take_along_axis(
                    blk[:, f * _SUB:(f + 1) * _SUB, :],
                    jnp.clip(s - f * _SUB, 0, _SUB - 1), axis=1)
                g = jnp.where(s >= f * _SUB, part, g)
            xg = jnp.take_along_axis(g, l, axis=2)
            acc = acc + v_ref[c].transpose(1, 0, 2) * xg
        y_ref[...] = jnp.sum(acc, axis=1)

    try:
        sec = bench3(k3_call(k3_batch_kernel))
        out["k3_batch_s"] = round(sec, 7)
    except Exception as e:  # noqa: BLE001
        out["k3_batch_error"] = str(e)[:150]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
