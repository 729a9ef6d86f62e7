"""Pure-NumPy oracle implementations for cross-checking the JAX solvers.

The reference has no tests (SURVEY §4); these oracles play the role its
manual residual-print eyeballing played, but automated: each solver's
trajectory must track the straightforward dense/NumPy implementation of
the same recurrences.
"""
from __future__ import annotations

import numpy as np


def bicgstab_oracle(A: np.ndarray, b: np.ndarray, tol=1e-12, max_iter=1000):
    """Dense-NumPy classic BiCGStab, identical update order to
    reference solver.c:86-120."""
    n = b.size
    x = np.zeros(n)
    r = b - A @ x
    r_hat = r.copy()
    p = r.copy()
    rTr = r @ r
    dot_zero = rTr
    dot_r = rTr
    hist = []
    k = 0
    while dot_r > tol * tol * dot_zero and k < max_iter:
        s = A @ p
        alpha = rTr / (r_hat @ s)
        q = r - alpha * s
        y = A @ q
        omega = (q @ y) / (y @ y)
        x = x + alpha * p + omega * q
        r = q - omega * y
        dot_r = r @ r
        rTr_new = r_hat @ r
        beta = (alpha / omega) * (rTr_new / rTr)
        rTr = rTr_new
        p = r + beta * (p - omega * s)
        hist.append(np.sqrt(dot_r / dot_zero))
        k += 1
    return x, k, np.array(hist)


def shifted_bicgstab_oracle(A: np.ndarray, b: np.ndarray, sigma: np.ndarray,
                            tol=1e-10, max_iter=1000):
    """Direct (unfactored) oracle: solve each (A + sigma_j I) x = b with
    dense LU — ground truth for every shifted-family solver."""
    n = b.size
    out = np.zeros((len(sigma), n))
    for j, s in enumerate(sigma):
        out[j] = np.linalg.solve(A + s * np.eye(n), b)
    return out
