"""ctypes binding to the C++ fast Matrix Market body parser.

Builds io/csrc/mmio_fast.cpp on first use (g++, cached next to the
source); falls back silently to the pure-Python path in io/mmio.py when
no compiler is available. See mmio_fast.cpp for why this exists (the
reference's double-fscanf IO hotspot, matrix.c:315-393).
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

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "mmio_fast.cpp")
_SO = os.path.join(os.path.dirname(__file__), "csrc", "libmmio_fast.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native parser; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.mmio_parse_body.restype = ctypes.c_int64
            lib.mmio_parse_body.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def parse_body_native(body: bytes, nnz: int, is_pattern: bool,
                      nthreads: int = 0):
    """Parse an MM coordinate body with the native parser.

    Returns (rows, cols, vals) int64/int64/float64 arrays, or None if
    the native library is unavailable (caller falls back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    per_row = 2 if is_pattern else 3
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    # strtod may read past a chunk end; guarantee a NUL sentinel
    buf = body if body.endswith(b"\0") else body + b"\0"
    got = lib.mmio_parse_body(
        buf, len(body), nnz, per_row,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nthreads)
    if got != nnz:
        raise ValueError(
            f"native MM parse failed (code {got}, expected {nnz} entries)")
    if is_pattern:
        vals.fill(1.0)
    return rows, cols, vals
