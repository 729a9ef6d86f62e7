#!/usr/bin/env python
"""Round-4 probe 3: honest pure-read HBM bandwidth.

probe2's read chain was doubly broken: `jnp.sum(vals)` is
loop-invariant (XLA hoists it — 84 TB/s printed) and a 96 MB buffer
fits v5e's 128 MiB VMEM, so even the read+write chain measured VMEM
bandwidth (5.8 TB/s), not HBM. Two fixes here:

  * the reduce depends on the loop carry NON-factorably
    (sum(|a + s|) — can't be pulled out or algebraically folded), and
  * the big variant streams a 512 MB buffer (4x VMEM) so residency is
    impossible: that one is the true HBM read rate.

The 96 MB variant runs too: the delta between the two shows how much
VMEM residency flatters a vals-sized loop-invariant stream (context
for the DIA SpMV roofline model — vals at Transport scale is 96 MB).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mpi_bicgstab_tpu.utils.opcache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mpi_bicgstab_tpu.benchmarks.runner import _slope_time

    out = {}
    for label, mb in (("read96", 96), ("read512", 512)):
        elems = mb * 1024 * 1024 // 4
        # generated ON DEVICE and passed as an argument: a host-side
        # closure constant this large gets embedded in the HLO and the
        # relay rejects the upload (HTTP 413)
        key = jax.random.PRNGKey(0)
        a = jax.jit(lambda k: jax.random.normal(
            k, (elems // 1024, 1024), jnp.float32))(key)
        a.block_until_ready()
        nbytes = a.size * 4

        def make(K, a=a):
            @jax.jit
            def run(a, s0):
                def body(i, s):
                    # depends on carry inside the |.|: not hoistable,
                    # not factorable — one full pass over `a` per iter
                    return jnp.sum(jnp.abs(a + s)) * 1e-30 + s * 0.5

                return lax.fori_loop(0, K, body, s0)

            return lambda: run(a, jnp.float32(1.0))

        sec = _slope_time(make, K1=20, K2=120, reps=5)
        out[f"{label}_s_per_pass"] = round(sec, 6)
        out[f"{label}_GBps"] = round(nbytes / sec / 1e9, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
