#!/usr/bin/env python
"""Round-4 gather probe 4: per-op cost of the K3 kernel's pieces at
the production shape (NR=12520, TB=40, C=2, F=2). Isolates:
  subtake   2 sublane takes + select chain per chunk (no lane take)
  lanetake  1 lane take per chunk (no sublane takes)
  fma       vals multiply-accumulate only
  full      the production body
so the 1186 us/iter K3 budget decomposes into op classes."""
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

    NR, TB, F, C = 12_520, 40, 2, 2
    SF = _SUB * F
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((NR * SF, _LANES)), jnp.float32)
    ss3 = jnp.asarray(rng.integers(0, 16, (C, _SUB, NR, _LANES)),
                      jnp.int8)
    li3 = jnp.asarray(rng.integers(0, 128, (C, _SUB, NR, _LANES)),
                      jnp.int8)
    v3 = jnp.asarray(rng.standard_normal((C, _SUB, NR, _LANES)),
                     jnp.float32)
    out = {"NR": NR, "TB": TB}

    def k3_call(kernel):
        def f(zz):
            tile = lambda: pl.BlockSpec(  # noqa: E731
                (C, _SUB, TB, _LANES), lambda s: (0, 0, s, 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                partial(kernel, C=C, F=F, TB=TB),
                grid=(NR // TB,),
                in_specs=[pl.BlockSpec((TB * SF, _LANES),
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

    def mk(body_fn):
        def kernel(z_ref, ss_ref, li_ref, v_ref, y_ref, *, C, F, TB):
            for tb in range(TB):
                stacked = z_ref[pl.ds(tb * SF, SF), :]
                acc = jnp.zeros((_SUB, _LANES), jnp.float32)
                for c in range(C):
                    acc = body_fn(stacked, ss_ref[c, :, tb],
                                  li_ref[c, :, tb], v_ref[c, :, tb],
                                  acc)
                y_ref[tb] = jnp.sum(acc, axis=0)

        return kernel

    def full_body(stacked, ss8, li8, v, acc):
        s = ss8.astype(jnp.int32)
        l = li8.astype(jnp.int32)  # noqa: E741
        g = jnp.take_along_axis(stacked[0:_SUB, :],
                                jnp.minimum(s, _SUB - 1), axis=0)
        part = jnp.take_along_axis(stacked[_SUB:2 * _SUB, :],
                                   jnp.clip(s - _SUB, 0, _SUB - 1),
                                   axis=0)
        g = jnp.where(s >= _SUB, part, g)
        xg = jnp.take_along_axis(g, l, axis=1)
        return acc + v * xg

    def subtake_body(stacked, ss8, li8, v, acc):
        s = ss8.astype(jnp.int32)
        g = jnp.take_along_axis(stacked[0:_SUB, :],
                                jnp.minimum(s, _SUB - 1), axis=0)
        part = jnp.take_along_axis(stacked[_SUB:2 * _SUB, :],
                                   jnp.clip(s - _SUB, 0, _SUB - 1),
                                   axis=0)
        g = jnp.where(s >= _SUB, part, g)
        return acc + v * g

    def onesub_body(stacked, ss8, li8, v, acc):
        s = ss8.astype(jnp.int32)
        g = jnp.take_along_axis(stacked[0:_SUB, :],
                                jnp.minimum(s, _SUB - 1), axis=0)
        return acc + v * g

    def lanetake_body(stacked, ss8, li8, v, acc):
        l = li8.astype(jnp.int32)  # noqa: E741
        xg = jnp.take_along_axis(stacked[0:_SUB, :], l, axis=1)
        return acc + v * xg

    def fma_body(stacked, ss8, li8, v, acc):
        return acc + v * stacked[0:_SUB, :]

    for name, body in (("full", full_body), ("subtake", subtake_body),
                       ("onesub", onesub_body),
                       ("lanetake", lanetake_body), ("fma", fma_body)):
        try:
            sec = bench3(k3_call(mk(body)))
            out[f"{name}_s"] = round(sec, 7)
        except Exception as e:  # noqa: BLE001
            out[f"{name}_error"] = repr(e)[:120]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
