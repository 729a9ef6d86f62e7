"""Fused df32 shift-update kernel for the shifted/switching solvers.

The reference's hot shift-update loop (shifted_switching_solver.c:
429-445) is sigma_len x n_loc of daxpy traffic per iteration. For f32
the blocked MXU path (solvers/switching_blocked.py) removes that
traffic altogether, but df32 cannot ride the MXU — an f32 matmul's
K-term accumulation rounds at 2^-24 per term and would discard the
double-float low parts. So the df32 path stays per-iteration and this
kernel makes that single pass as cheap as the hardware allows: all
three update stages of the [S, n] x_set/p_set state — with the
convergence mask folded into the per-shift coefficients — run in ONE
Pallas pass, the error-free transforms executing in-kernel (Mosaic
preserves EFTs bit-exactly on the chip; see ops/pallas_fused_pipe_df).

    x'    = x + df_fma(cxp*p, cxq, q)                (ssw:437-438)
    p_mid = p + df_fma(cpq*q, cpr, r_old)            (ssw:439-440)
    p'    = df_fma(m1*p_mid, m2, r_new)              (ssw:443-444)

Inactive (stopped or seed) rows compose with cxp=cxq=cpq=cpr=0, m1=1,
m2=0 — exact identities for normalized DF pairs, so frozen shifts pass
through unchanged (the boolean-mask semantics of ssw:136-149 without a
separate select pass). The DF association mirrors the XLA build in
solvers/switching._switching_loop.

x_set/p_set blocks are input_output_aliased: the kernel updates the
[S, n] state in place, so the pass costs exactly 2 reads + 2 writes of
the DF state (the HBM floor) and no extra HBM footprint.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def available(S: int, n: int, dtype) -> bool:
    """Compiled-kernel gate: DF f32 state, TPU backend, x64 off,
    tileable shapes."""
    if os.environ.get("MBT_FUSED_SHIFT", "").lower() in ("0", "off"):
        return False
    if jax.default_backend() != "tpu" or jax.config.jax_enable_x64:
        return False
    return format_ok(S, n, dtype)


def format_ok(S: int, n: int, dtype) -> bool:
    if not (dtype == jnp.float32 and S % 8 == 0 and S >= 8
            and n % _LANES == 0):
        return False
    # wide ladders can leave NO feasible tile width (the 8 S x nt
    # double-buffered DF streams bust VMEM for every nt dividing n) —
    # the kernel would raise at trace time; gate it so the XLA branch
    # runs instead
    return _pick_nt(S, n) > 0


def _pick_nt(S: int, n: int) -> int:
    """Largest lane-tile width that divides n and keeps the streamed
    blocks (8 S x nt hi/lo buffers, double-buffered) + resident coefs
    inside ~12 MB of VMEM."""
    budget = 12 * 1024 * 1024 - 2 * 6 * S * _LANES * 4
    for nt in (1024, 512, 256, 128):
        if n % nt == 0 and 8 * S * nt * 4 * 2 <= budget:
            return nt
    return 0


def pack_coeffs(cxp, cxq, cpq, cpr, m1, m2):
    """Six DF [S] coefficient vectors -> ([6, S, 128] hi, lo) with the
    value replicated along lanes (the kernel slices lane 0 and
    broadcasts; VMEM wants lane-dim multiples of 128)."""
    hs = jnp.stack([c.hi for c in (cxp, cxq, cpq, cpr, m1, m2)])
    ls = jnp.stack([c.lo for c in (cxp, cxq, cpq, cpr, m1, m2)])
    rep = lambda a: jnp.broadcast_to(a[:, :, None],  # noqa: E731
                                     a.shape + (_LANES,))
    return rep(hs), rep(ls)


def _kernel(cfh_ref, cfl_ref, xh_ref, xl_ref, ph_ref, pl_ref,
            qh_ref, ql_ref, roh_ref, rol_ref, rnh_ref, rnl_ref,
            x2h_ref, x2l_ref, p2h_ref, p2l_ref, *, S, nt):
    from mpi_bicgstab_tpu.ops.precision import DF, df_fma, df_mul

    def coef(k):
        bc = lambda a: jnp.broadcast_to(a[k][:, 0:1], (S, nt))  # noqa
        return DF(bc(cfh_ref), bc(cfl_ref))

    def vec(h_ref, l_ref):
        bc = lambda a: jnp.broadcast_to(a[...], (S, nt))  # noqa: E731
        return DF(bc(h_ref), bc(l_ref))

    cxp, cxq, cpq, cpr, m1, m2 = (coef(k) for k in range(6))
    x = DF(xh_ref[...], xl_ref[...])
    p = DF(ph_ref[...], pl_ref[...])
    q = vec(qh_ref, ql_ref)
    ro = vec(roh_ref, rol_ref)
    rn = vec(rnh_ref, rnl_ref)
    from mpi_bicgstab_tpu.ops.precision import df_add
    x2 = df_add(x, df_fma(df_mul(cxp, p), cxq, q))      # ssw:437-438
    pm = df_add(p, df_fma(df_mul(cpq, q), cpr, ro))     # ssw:439-440
    p2 = df_fma(df_mul(m1, pm), m2, rn)                 # ssw:443-444
    x2h_ref[...], x2l_ref[...] = x2.hi, x2.lo
    p2h_ref[...], p2l_ref[...] = p2.hi, p2.lo


@partial(jax.jit, static_argnames=("nt", "interpret"))
def _call(xh, xl, ph, pl_, qh, ql, roh, rol, rnh, rnl, cfh, cfl,
          nt: int, interpret: bool = False):
    S, n = xh.shape
    G = n // nt
    big = lambda: pl.BlockSpec((S, nt), lambda i: (0, i),  # noqa: E731
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, nt), lambda i: (0, i),  # noqa: E731
                               memory_space=pltpu.VMEM)
    cf = lambda: pl.BlockSpec((6, S, _LANES), lambda i: (0, 0, 0),  # noqa
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_kernel, S=S, nt=nt),
        grid=(G,),
        in_specs=[cf(), cf(), big(), big(), big(), big(),
                  row(), row(), row(), row(), row(), row()],
        out_specs=tuple(big() for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((S, n), jnp.float32)
                        for _ in range(4)),
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )(cfh, cfl, xh, xl, ph, pl_,
      qh.reshape(1, n), ql.reshape(1, n), roh.reshape(1, n),
      rol.reshape(1, n), rnh.reshape(1, n), rnl.reshape(1, n))
    return outs


def fused_shift_update_df(x_set, p_set, q, r_old, r_new,
                          cxp, cxq, cpq, cpr, m1, m2,
                          interpret: bool = False):
    """Apply one iteration's masked shift updates to the DF [S, n]
    state in a single fused pass. Coefficients are DF [S] vectors with
    the active mask already folded in (inactive rows: 0,0,0,0,1,0).
    Returns (x_set', p_set')."""
    from mpi_bicgstab_tpu.ops.precision import DF
    S, n = x_set.hi.shape
    nt = _pick_nt(S, n)
    if nt == 0:
        raise ValueError(f"no feasible tile width for S={S}, n={n}")
    cfh, cfl = pack_coeffs(cxp, cxq, cpq, cpr, m1, m2)
    x2h, x2l, p2h, p2l = _call(
        x_set.hi, x_set.lo, p_set.hi, p_set.lo, q.hi, q.lo,
        r_old.hi, r_old.lo, r_new.hi, r_new.lo, cfh, cfl,
        nt=nt, interpret=interpret)
    return DF(x2h, x2l), DF(p2h, p2l)
