"""Fused df32 shift-update kernel (ops/pallas_shift_update.py):
interpret-mode correctness vs the XLA formulas of
solvers/switching._switching_loop (compiled runs are chip-checked by
scripts/chip_pallas_check.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_bicgstab_tpu.ops.pallas_shift_update import (_pick_nt,
                                                      format_ok,
                                                      fused_shift_update_df)
from mpi_bicgstab_tpu.ops.precision import (DF, df_from_f64, df_to_f64,
                                            df_where, vfma)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode suite is CPU-only; compiled path is "
           "chip-checked (scripts/chip_pallas_check.py)")


def _mk(rng, shape):
    return df_from_f64(rng.standard_normal(shape))


def _xla_reference(x, p, q, ro, rn, coefs, active):
    cxp, cxq, cpq, cpr, m1, m2 = coefs
    # the exact expression order of _switching_loop's XLA branch
    x_upd = vfma(cxp[:, None] * p, cxq[:, None], q[None, :])
    x2 = x + df_where(active[:, None], x_upd, DF(0.0, 0.0))
    p_upd = vfma(cpq[:, None] * q[None, :], cpr[:, None], ro[None, :])
    pm = p + df_where(active[:, None], p_upd, DF(0.0, 0.0))
    p_upd2 = vfma(m1[:, None] * pm, m2[:, None], rn[None, :])
    p2 = df_where(active[:, None], p_upd2, pm)
    return x2, p2


def test_fused_matches_xla_formulas():
    rng = np.random.default_rng(0)
    S, n = 16, 512
    x, p = _mk(rng, (S, n)), _mk(rng, (S, n))
    q, ro, rn = _mk(rng, n), _mk(rng, n), _mk(rng, n)
    raw = [_mk(rng, S) for _ in range(6)]
    active = jnp.asarray(rng.random(S) < 0.7)
    # fold the mask into the coefficients the way the solver does
    zero = df_from_f64(np.zeros(S))
    one = df_from_f64(np.ones(S))
    cxp = df_where(active, raw[0], zero)
    cxq = df_where(active, raw[1], zero)
    cpq = df_where(active, raw[2], zero)
    cpr = df_where(active, raw[3], zero)
    m1 = df_where(active, raw[4], one)
    m2 = df_where(active, raw[5], zero)
    x2k, p2k = fused_shift_update_df(x, p, q, ro, rn, cxp, cxq, cpq,
                                     cpr, m1, m2, interpret=True)
    x2x, p2x = _xla_reference(x, p, q, ro, rn,
                              (cxp, cxq, cpq, cpr, m1, m2), active)
    np.testing.assert_allclose(df_to_f64(x2k), df_to_f64(x2x),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(df_to_f64(p2k), df_to_f64(p2x),
                               rtol=1e-13, atol=1e-13)
    # inactive rows pass through bit-exactly (identity coefficients)
    inact = ~np.asarray(active)
    np.testing.assert_array_equal(np.asarray(x2k.hi)[inact],
                                  np.asarray(x.hi)[inact])
    np.testing.assert_array_equal(np.asarray(p2k.hi)[inact],
                                  np.asarray(p.hi)[inact])


def test_gates_and_tiles():
    assert format_ok(512, 1602560, jnp.float32)
    assert not format_ok(5, 1024, jnp.float32)      # S not 8-aligned
    assert not format_ok(512, 1000, jnp.float32)    # n not lane-aligned
    assert not format_ok(512, 1024, jnp.float64)
    nt = _pick_nt(512, 1602560)
    assert nt > 0 and 1602560 % nt == 0
    assert _pick_nt(8, 1024) >= 128
