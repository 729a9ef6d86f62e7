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


def bicgstab_l_oracle(A: np.ndarray, b: np.ndarray, l: int = 2,
                      tol=1e-12, max_iter=1000):
    """Dense-NumPy BiCGStab(l) (Sleijpen-Fokkema alg. 3.1), identical
    update order to solvers/bicgstab_l.py."""
    n = b.size
    x = np.zeros(n)
    r0 = b - A @ x
    r_hat = r0.copy()
    R = np.zeros((l + 1, n)); R[0] = r0
    U = np.zeros((l + 1, n))
    rho0, alpha, omega = 1.0, 0.0, 1.0
    dot_zero = r0 @ r0
    dot_r = dot_zero
    hist = []
    k = 0
    while dot_r > tol * tol * dot_zero and k < max_iter:
        rho0 = -omega * rho0
        for j in range(l):
            rho1 = R[j] @ r_hat
            beta = alpha * (rho1 / rho0)
            rho0 = rho1
            for i in range(j + 1):
                U[i] = R[i] - beta * U[i]
            U[j + 1] = A @ U[j]
            alpha = rho0 / (U[j + 1] @ r_hat)
            for i in range(j + 1):
                R[i] = R[i] - alpha * U[i + 1]
            R[j + 1] = A @ R[j]
            x = x + alpha * U[0]
        tau = {}
        sigma = [None] * (l + 1)
        gam_p = [None] * (l + 1)
        for j in range(1, l + 1):
            for i in range(1, j):
                tau[(i, j)] = (R[j] @ R[i]) / sigma[i]
                R[j] = R[j] - tau[(i, j)] * R[i]
            sigma[j] = R[j] @ R[j]
            gam_p[j] = (R[0] @ R[j]) / sigma[j]
        gam = [None] * (l + 1)
        gam[l] = gam_p[l]
        omega = gam[l]
        for j in range(l - 1, 0, -1):
            gam[j] = gam_p[j] - sum(tau[(j, i)] * gam[i]
                                    for i in range(j + 1, l + 1))
        gam_pp = [None] * l
        for j in range(1, l):
            gam_pp[j] = gam[j + 1] + sum(tau[(j, i)] * gam[i + 1]
                                         for i in range(j + 1, l))
        x = x + gam[1] * R[0]
        r_new = R[0] - gam_p[l] * R[l]
        u_new = U[0] - gam[l] * U[l]
        for j in range(1, l):
            u_new = u_new - gam[j] * U[j]
            x = x + gam_pp[j] * R[j]
            r_new = r_new - gam_p[j] * R[j]
        R[0] = r_new
        U[0] = u_new
        dot_r = r_new @ r_new
        hist.append(np.sqrt(dot_r / dot_zero))
        k += l
    return x, k, np.array(hist)
