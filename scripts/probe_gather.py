"""Probe TPU gather primitives for the unstructured-SpMV kernel design.

The unstructured fallback's cost is one dynamic gather x[col] per nnz
(everything else — multiply, row-segment reduce over a static layout —
is cheap VPU work). This measures every way this chip can express that
gather, slope-timed (axon relay: absolute times are meaningless):

  xla1d    — jnp.take on a flat [n] vector (the round-1 gather-ELL path)
  xla2d    — take_along_axis on [R,128] source with lane-aligned indices
  onehot   — per-128-window one-hot matmul on the MXU (bf16)
  pallas_wN — Pallas kernel: take_along_axis over a [W,128] VMEM window
              (Mosaic dynamic_gather), W = 8..512, measuring the
              select-chain scaling in W

Each probe gathers M elements; report Gelem/s. Data dependence between
chain steps goes through the INDEX array (derived from the running
accumulator) so XLA cannot hoist the gather out of the timing loop.
"""
import os as _os
import sys as _os_sys
_os_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import functools
import json
import sys
import time

import numpy as np


def slope(fn, K1=4, K2=12, reps=5):
    c1 = fn(K1)
    c2 = fn(K2)
    float(c1())
    float(c2())
    ss = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1())
        t1 = time.perf_counter(); float(c2())
        t2 = time.perf_counter()
        ss.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
    pos = [s for s in ss if s > 0]
    return float(np.median(pos if pos else ss))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 1_605_632            # x size; R = n/128 = 12544 = 64*196
    R = n // 128
    M = 12_845_056           # gathered elements (~8 nnz/row), mult of 1024
    K = M // 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x2d = x.reshape(R, 128)
    flat_idx = rng.integers(0, n, size=M).astype(np.int32)
    idx2d = jnp.asarray((flat_idx // 128).reshape(K, 128))  # sublane idx
    idx1d = jnp.asarray(flat_idx)

    results = {}

    def report(name, t, m=M):
        results[name] = {"s_per_op": t, "Gelem_per_s": m / t / 1e9}
        print(json.dumps({name: results[name]}), flush=True)

    # -------- xla 1d flat gather ------------------------------------
    @jax.jit
    def chain1d(x, idx, K):
        def body(_, c):
            acc, ix = c
            g = jnp.take(x, ix, mode="fill", fill_value=0)
            s = g[0] * 1e-30
            ix = ix + jnp.int32(s)          # runtime 0, not foldable
            return acc + g[::65536].sum(), ix
        acc, _ = lax.fori_loop(0, K, body, (jnp.float32(0), idx))
        return acc

    t = slope(lambda KK: functools.partial(
        lambda: jax.block_until_ready(chain1d(x, idx1d, KK))))
    report("xla1d", t)

    # -------- xla 2d lane-aligned take_along_axis -------------------
    @jax.jit
    def chain2d(x2d, idx, K):
        def body(_, c):
            acc, ix = c
            g = jnp.take_along_axis(x2d, ix, axis=0,
                                    mode="fill", fill_value=0)
            s = g[0, 0] * 1e-30
            ix = ix + jnp.int32(s)
            return acc + g[::4096].sum(), ix
        acc, _ = lax.fori_loop(0, K, body, (jnp.float32(0), idx))
        return acc

    t = slope(lambda KK: functools.partial(
        lambda: jax.block_until_ready(chain2d(x2d, idx2d, KK))))
    report("xla2d", t)

    # -------- one-hot matmul gather (window 128, bf16 MXU) ----------
    # gathers M elements from 128-col windows: window w supplies the
    # sources for nnz chunk w (col-sorted layout assumption)
    Mw = M // R  # elements per window chunk (exact split for the probe)
    loc = jnp.asarray(rng.integers(0, 128, size=(R, Mw)).astype(np.int32))

    C = 64                      # windows per scan chunk (VMEM-sized)
    i128 = jnp.arange(128, dtype=jnp.int32)

    @jax.jit
    def chain_oh(x2d, loc, K):
        locc = loc.reshape(R // C, C, Mw)
        xwc = x2d.reshape(R // C, C, 128).astype(jnp.bfloat16)

        def body(_, acc):
            def chunk(carry, args):
                lc_c, xw_c = args
                lc_c = lc_c + jnp.int32(carry * 1e-30)
                oh = (lc_c[..., None] == i128).astype(jnp.bfloat16)
                xg = jnp.einsum("cmk,ck->cm", oh, xw_c,
                                preferred_element_type=jnp.float32)
                return carry + xg[:, 0].sum(), None
            acc, _ = lax.scan(chunk, acc, (locc, xwc))
            return acc
        return lax.fori_loop(0, K, body, jnp.float32(0))

    t = slope(lambda KK: functools.partial(
        lambda: jax.block_until_ready(chain_oh(x2d, loc, KK))))
    report("onehot", t)

    # -------- pallas windowed dynamic_gather -------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe_pallas(W, reps_in=64):
        """One [W,128] VMEM window, gather [8,128] tiles reps_in times
        per kernel call (in-kernel chain via index data dependence)."""
        src = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
        pidx = jnp.asarray(rng.integers(0, W, size=(256, 128)),
                           jnp.int32)

        def kern(src_ref, idx_ref, out_ref):
            def body(i, acc):
                ix = (idx_ref[...] + jnp.int32(acc[0, 0] * 1e-30)) % W
                g = jnp.take_along_axis(src_ref[...], ix, axis=0)
                # consume EVERY gathered row so nothing is DCE'd
                return acc + g.reshape(32, 8, 128).sum(axis=0)
            out_ref[...] = lax.fori_loop(0, reps_in, body,
                                         jnp.zeros((8, 128), jnp.float32))

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        def mk(KK):
            g = jax.jit(lambda: sum(f(src, pidx * (i % 2 + 1) % W).sum()
                                    for i in range(KK)))
            return lambda: jax.block_until_ready(g())
        # per-call cost via outer slope; per-gather = /(reps_in*256*128)
        t = slope(mk, K1=2, K2=6)
        return t / reps_in, 256 * 128

    for W in (8, 32, 128, 512):
        try:
            t, m = probe_pallas(W)
            report(f"pallas_w{W}", t, m=m)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"pallas_w{W}": f"FAIL {type(e).__name__}: "
                              f"{str(e)[:300]}"}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
