#!/usr/bin/env python
"""Round-4 transpose probe, part 2: decompose the pipeline transpose's
340 GB/s (vs 912 GB/s for a clean 2-D .T) and prototype fusions.

  v4a  relayout only: [P,8,128] -> [P,1024] (carried round trip)
  v4b  relayout only: [P,1024] -> [P,8,128]
  v5   barrier-separated: relayout -> clean .T -> relayout
  v6   Pallas fused transpose+regroup prototype: reads (1024,1,128)
       column slabs of u1, in-kernel lane->sublane regroup, writes
       RENUMBERED windows (the layout the fused T1+K2 design needs).

All at the 1.6M-scale shapes (P=25600). One JSON line per result.
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

    P, B = 25_600, 1024
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((P, 8, 128)), jnp.float32)
    m = u.reshape(P, B)
    nbytes = P * B * 4 * 2
    out = {"P": P}

    def bench(body, v0, K1=8, K2=40):
        def make(K):
            @jax.jit
            def run(v):
                r = lax.fori_loop(0, K, body, v)
                return jnp.sum(jax.tree_util.tree_leaves(r)[0][0])

            return lambda: run(v0)

        return _slope_time(make, K1=K1, K2=K2, reps=5)

    # v4a/b: relayout round trip (2 relayouts per iter)
    def v4(i, v):
        a = lax.optimization_barrier(
            v.reshape(P, B) * (1.0 / (1.0 + v[0, 0, 0] ** 2)))
        return lax.optimization_barrier(
            a.reshape(P, 8, 128) * (1.0 / (1.0 + a[0, 0] ** 2)))

    sec = bench(v4, u) / 2
    out["v4_relayout_s"] = round(sec, 7)
    out["v4_relayout_GBps"] = round(nbytes / sec / 1e9, 1)
    print(json.dumps(out), flush=True)

    # v5: relayout -> clean T -> relayout, all barriered apart
    def v5(i, v):
        a = lax.optimization_barrier(v.reshape(P, B))
        t = lax.optimization_barrier(a.T)          # clean 2-D T
        w = lax.optimization_barrier(
            t.reshape(P, 8, 128) * (1.0 / (1.0 + t[0, 0] ** 2)))
        # second leg back so the carry shape round-trips
        a2 = lax.optimization_barrier(w.reshape(P, B))
        t2 = lax.optimization_barrier(a2.T)
        return lax.optimization_barrier(
            t2.reshape(P, 8, 128) * (1.0 / (1.0 + t2[0, 0] ** 2)))

    sec = bench(v5, u) / 2
    out["v5_split_s"] = round(sec, 7)
    out["v5_split_GBps"] = round(nbytes / sec / 1e9, 1)
    print(json.dumps(out), flush=True)

    # v6: Pallas fused transpose+regroup. Out is the renumbered
    # [C25, 8bt, 128bb, 8, 128] window array; grid (C25, 8).
    C25 = P // B          # windows per transposed row   (25)
    BT = 8                # b-tile count (1024 // 128)

    def _t6_kernel(in_ref, out_ref):
        # in:  (1024, 8, 128)  = u1[p', b_tile, lanes]
        # out: (1, 8bt, 128bb, 8, 128): out[bt, bb, s', l'] =
        #      in[s'*128+l', bt, bb]
        for bt in range(BT):
            t = in_ref[:, bt, :].T                  # (128, 1024)
            out_ref[0, bt] = t.reshape(128, 8, 128)

    @jax.jit
    def pallas_T6(a):
        return pl.pallas_call(
            _t6_kernel,
            grid=(C25,),
            in_specs=[pl.BlockSpec((B, 8, 128), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BT, 128, 8, 128),
                                   lambda c: (c, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C25, BT, 128, 8, 128),
                                           a.dtype),
        )(a)

    # correctness: out[c, bt, bb, s, l] == mid[w'=(bt*128+bb)*C25+c...]
    # renumbered: window (b, c) holds T-row b=bt*128+bb, p-range
    # [1024c, 1024c+1024) -> equals u[p'=s*128+l + 1024c, b]
    try:
        got = np.asarray(pallas_T6(u))
        un = np.asarray(u)
        c, bt, bb, s, l = 3, 2, 5, 4, 17
        want = un[1024 * c + s * 128 + l, bt, bb]
        assert got[c, bt, bb, s, l] == want, (got[c, bt, bb, s, l], want)

        def v6(i, v):
            o = pallas_T6(v)
            return lax.optimization_barrier(
                v * (1.0 / (1.0 + o[0, 0, 0, 0, 0] ** 2)))

        sec = bench(v6, u)          # ONE transpose per iter
        out["v6_pallas_regroup_s"] = round(sec, 7)
        out["v6_pallas_regroup_GBps"] = round(nbytes / sec / 1e9, 1)
    except Exception as e:  # noqa: BLE001
        out["v6_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
