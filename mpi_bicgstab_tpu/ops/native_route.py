"""ctypes binding to the native butterfly route assigner.

Builds ops/csrc/butterfly_route.cpp on first use (g++, cached next to
the source); ops/butterfly falls back to the vectorized-numpy
round-based assigner when no compiler is available. The native version
is a single sequential pass with immediate claims — an element retries
on the spot with a fresh random option instead of waiting for the next
global round, so it converges in ~1-2 tries without any intermediate
array materialization (~5x the numpy assigner on this hot loop).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "csrc",
                    "butterfly_route.cpp")
_SO = os.path.join(os.path.dirname(__file__), "csrc",
                   "libbutterfly_route.so")

_I64P = ctypes.POINTER(ctypes.c_int64)


def _build() -> str | None:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MBT_NATIVE_ROUTE", "").lower() in ("0", "off"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.bfly_assign.restype = ctypes.c_int64
            lib.bfly_assign.argtypes = (
                [ctypes.c_int64] + [_I64P] * 5 + [_I64P, _I64P]
                + [ctypes.c_int64] * 5 + [ctypes.c_uint64,
                                          ctypes.c_int64, _I64P, _I64P])
            lib.bfly_color.restype = ctypes.c_int64
            lib.bfly_color.argtypes = (
                [ctypes.c_int64] + [_I64P] * 4
                + [ctypes.c_int64] * 3
                + [ctypes.c_uint64, ctypes.c_int64, _I64P])
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def _p(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


def assign_native(d, u_col, m_hi, q, src_lane, win_a, n_opts, max_k,
                  Ts, G, P, Td, seed, tries=64):
    """Run bfly_assign; returns (a_sel, m_sel) or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    E = d.size
    a_sel = np.empty(E, np.int64)
    m_sel = np.empty(E, np.int64)
    d, u_col, m_hi, q, src_lane, win_a, n_opts = (
        _c64(a) for a in (d, u_col, m_hi, q, src_lane, win_a, n_opts))
    n = lib.bfly_assign(
        E, _p(d), _p(u_col), _p(m_hi), _p(q),
        _p(src_lane), _p(win_a), _p(n_opts),
        int(max_k), int(Ts), int(G), int(P), int(Td),
        int(seed) & (2**64 - 1), int(tries), _p(a_sel), _p(m_sel))
    if n < 0:
        return None
    return a_sel, m_sel


def color_native(rows, grp, lane, sub, n_pad, NR, W3, seed, tries=64):
    """Run bfly_color; returns w_sel or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    NE = rows.size
    w_sel = np.empty(NE, np.int64)
    rows, grp, lane, sub = (_c64(a) for a in (rows, grp, lane, sub))
    n = lib.bfly_color(
        NE, _p(rows), _p(grp), _p(lane), _p(sub),
        int(n_pad), int(NR), int(W3), int(seed) & (2**64 - 1),
        int(tries), _p(w_sel))
    if n < 0:
        return None
    return w_sel
