"""Probe the routed-shuffle pipeline's primitives on the chip
(round-3, VERDICT missing #1 — uniform-random SpMV).

The pipeline factors an arbitrary 24M-element gather into passes whose
random access is always WITHIN a resident 1024-element window, windows
advancing SEQUENTIALLY, plus XLA transposes. This script slope-times:

  1. streamed-window gather: out[k, :] gathered from window k (resident
     [8,128] slab k of the source), 2 chained dynamic_gathers — the K1
     kernel of the pipeline (and the gather core of pallas_window_spmv,
     minus accumulate).
  2. XLA transpose [P, 1024] -> [1024, P] f32 at ~100 MB scale.
  3. sublane-route: out[k] = src[rowsel[k]] among 8 stacked window rows
     (the middle-stage combine).

Usage: python scripts/probe_shuffle.py  (needs TPU; x64 off)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import time
from functools import partial

import numpy as np


def slope(fn, K1=3, K2=9, reps=5):
    c1, c2 = fn(K1), fn(K2)
    float(c1()); float(c2())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1())
        t1 = time.perf_counter(); float(c2())
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
    pos = [t for t in ts if t > 0]
    return float(np.median(pos if pos else ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    assert not jax.config.jax_enable_x64
    rng = np.random.default_rng(0)
    out = {}

    # ---- 1. streamed-window gather -------------------------------
    # src [T, 8, 128]; out tile k gathers 1024 arbitrary elements from
    # src tile k. TB tiles per grid step (grid-overhead lesson).
    T = 16384                       # 16.7M gathers
    TB = 16
    sub = rng.integers(0, 8, (T, 8, 128)).astype(np.int8)
    lane = rng.integers(0, 128, (T, 8, 128)).astype(np.int8)
    src = rng.standard_normal((T, 8, 128)).astype(np.float32)

    def k1(ss_ref, li_ref, s_ref, o_ref):
        def body(t, acc):
            w = s_ref[t]
            ss = ss_ref[t].astype(jnp.int32)
            li = li_ref[t].astype(jnp.int32)
            t1 = jnp.take_along_axis(w, ss, axis=0)       # sublane
            xg = jnp.take_along_axis(t1, li, axis=1)      # lane
            return acc + xg
        acc = lax.fori_loop(0, TB, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[0] = acc

    spec3 = lambda: pl.BlockSpec((TB, 8, 128), lambda i: (i, 0, 0),  # noqa
                                 memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        k1, grid=(T // TB,),
        in_specs=[spec3(), spec3(), spec3()],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // TB, 8, 128), jnp.float32))

    ssd, lid, srcd = map(jnp.asarray, (sub, lane, src))

    def mk1(K):
        @jax.jit
        def chain(s):
            def body(i, s):
                o = call(ssd, lid, s)
                # data dependence: fold output back into the source
                return s * (1.0 / (1.0 + jnp.sum(o[0]) ** 2))
            return jnp.sum(lax.fori_loop(0, K, body, s)[0])
        return lambda: chain(srcd)

    t = slope(mk1)
    out["streamed_window_gather"] = {
        "s": t, "Gelem_per_s": T * 1024 / t / 1e9}
    print(json.dumps(out["streamed_window_gather"]), flush=True)

    # ---- 2. XLA transpose [P,1024] f32 ---------------------------
    P = 24576
    m = jnp.asarray(rng.standard_normal((P, 1024)).astype(np.float32))

    def mk2(K):
        @jax.jit
        def chain(a):
            def body(i, a):
                # barriers stop XLA from cancelling the T-T round trip
                b = lax.optimization_barrier(
                    a.T * (1.0 / (1.0 + a[0, 0] * a[0, 0])))
                return lax.optimization_barrier(
                    b.T * (1.0 / (1.0 + b[0, 0] * b[0, 0])))
            return jnp.sum(lax.fori_loop(0, K, body, a)[0])
        return lambda: chain(m)

    t2 = slope(mk2) / 2          # two transposes per loop body
    out["xla_transpose"] = {"s": t2, "GBps": P * 1024 * 4 * 2 / t2 / 1e9}
    print(json.dumps(out["xla_transpose"]), flush=True)

    # ---- 3. per-128-lane-chunk row gather on long rows ------------
    # post-transpose rows of length P' (=2048): gather within a
    # 2048-window = chained select over two [8,128] windows
    T3 = 8192
    src3 = rng.standard_normal((T3, 16, 128)).astype(np.float32)
    ss3 = rng.integers(0, 16, (T3, 8, 128)).astype(np.int8)
    li3 = rng.integers(0, 128, (T3, 8, 128)).astype(np.int8)

    def k3(ss_ref, li_ref, s_ref, o_ref):
        def body(t, acc):
            w = s_ref[t]
            ss = ss_ref[t].astype(jnp.int32)
            li = li_ref[t].astype(jnp.int32)
            lo = jnp.take_along_axis(w[:8], jnp.minimum(ss, 7), axis=0)
            hi = jnp.take_along_axis(w[8:], jnp.maximum(ss - 8, 0),
                                     axis=0)
            t1 = jnp.where(ss < 8, lo, hi)
            xg = jnp.take_along_axis(t1, li, axis=1)
            return acc + xg
        acc = lax.fori_loop(0, TB, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[0] = acc

    spec16 = lambda: pl.BlockSpec((TB, 16, 128), lambda i: (i, 0, 0),  # noqa
                                  memory_space=pltpu.VMEM)
    spec8 = lambda: pl.BlockSpec((TB, 8, 128), lambda i: (i, 0, 0),  # noqa
                                 memory_space=pltpu.VMEM)
    call3 = pl.pallas_call(
        k3, grid=(T3 // TB,),
        in_specs=[spec8(), spec8(), spec16()],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T3 // TB, 8, 128), jnp.float32))
    ss3d, li3d, src3d = map(jnp.asarray, (ss3, li3, src3))

    def mk3(K):
        @jax.jit
        def chain(s):
            def body(i, s):
                o = call3(ss3d, li3d, s)
                return s * (1.0 / (1.0 + jnp.sum(o[0]) ** 2))
            return jnp.sum(lax.fori_loop(0, K, body, s)[0])
        return lambda: chain(src3d)

    t3 = slope(mk3)
    out["window2048_gather"] = {
        "s": t3, "Gelem_per_s": T3 * 1024 / t3 / 1e9}
    print(json.dumps(out["window2048_gather"]), flush=True)


if __name__ == "__main__":
    main()
