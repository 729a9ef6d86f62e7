#!/usr/bin/env python
"""Round-4 transpose probe: the butterfly pipeline's two
[P,1024]<->[1024,P] f32 transposes measure 610 us each at 1.6M
(scripts/chip_butterfly_phases.py: t_each_s=6.1e-4 -> 344 GB/s) while
probe_shuffle's standalone [24576,1024].T chain measured ~806 GB/s.
This probe pins down where the factor ~2 goes and tests a Pallas
tile-transpose replacement:

  v1  m.T alone at [25600,1024] (probe_shuffle formulation, our P)
  v2  the pipeline's exact composition
      u.reshape(P,1024).T.reshape(P,8,128) from a [P,8,128] input
  v3  Pallas kernel: grid over column blocks, in (512,1024) ->
      out (1024,512), in-kernel .T

Prints one JSON line. Run on the chip.
"""
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    B = 1024
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((P, B)), jnp.float32)
    u = m.reshape(P, 8, 128)
    nbytes = P * B * 4 * 2      # read + write per transpose
    out = {"P": P}

    def bench(body, v0, K1=8, K2=40):
        def make(K):
            @jax.jit
            def run(v):
                return jnp.sum(lax.fori_loop(0, K, body, v)[0])

            return lambda: run(v0)

        sec = _slope_time(make, K1=K1, K2=K2, reps=5)
        return sec

    # v1: T-and-back, probe_shuffle style (2 transposes/iter)
    def v1(i, a):
        b = lax.optimization_barrier(a.T * (1.0 / (1.0 + a[0, 0] ** 2)))
        return lax.optimization_barrier(
            b.T * (1.0 / (1.0 + b[0, 0] ** 2)))

    sec = bench(v1, m) / 2
    out["v1_plainT_s"] = round(sec, 7)
    out["v1_plainT_GBps"] = round(nbytes / sec / 1e9, 1)

    # v2: the pipeline's exact composition, carried shape [P,8,128]
    def v2(i, v):
        return lax.optimization_barrier(
            v.reshape(P, B).T.reshape(P, 8, 128)
            * (1.0 / (1.0 + v[0, 0, 0] ** 2)))

    sec = bench(v2, u)
    out["v2_pipelineT_s"] = round(sec, 7)
    out["v2_pipelineT_GBps"] = round(nbytes / sec / 1e9, 1)

    # v3: Pallas 2-D tiled transpose (generic (R,C) -> (C,R))
    def _t_kernel(in_ref, out_ref):
        out_ref[...] = in_ref[...].T

    def pallas_T(a, TR=512, TC=512):
        R, C = a.shape
        return pl.pallas_call(
            _t_kernel,
            grid=(R // TR, C // TC),
            in_specs=[pl.BlockSpec((TR, TC), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TC, TR), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, R), a.dtype),
        )(a)

    # correctness first
    ref = np.asarray(m).T
    got = np.asarray(jax.jit(pallas_T)(m))
    assert np.array_equal(ref, got), "pallas transpose mismatch"

    for tr, tc in ((512, 512), (256, 1024), (1024, 256), (128, 1024)):
        if P % tr or B % tc:   # round-trip needs tr|P and tc|B
            continue

        def v3(i, a, tr=tr, tc=tc):
            b = lax.optimization_barrier(
                pallas_T(a, tr, tc) * (1.0 / (1.0 + a[0, 0] ** 2)))
            return lax.optimization_barrier(
                pallas_T(b, tc, tr) * (1.0 / (1.0 + b[0, 0] ** 2)))

        try:
            sec = bench(v3, m) / 2
        except Exception as e:  # noqa: BLE001
            out[f"v3_{tr}x{tc}_error"] = str(e)[:120]
            continue
        out[f"v3_{tr}x{tc}_s"] = round(sec, 7)
        out[f"v3_{tr}x{tc}_GBps"] = round(nbytes / sec / 1e9, 1)
        print(json.dumps(out), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
