"""Unrolled tiny-matrix linear algebra for batched geometry solves.

``jax.scipy.linalg.cho_factor``/``cho_solve`` lower to blocked loop kernels
on TPU that are pathological for 6x6/12x12 systems batched a few hundred
wide — measured as the dominant cost of RANSAC-PnP (the per-hypothesis
Gauss-Newton normal equations and the DLT inverse iteration). Here the
Cholesky factorization and the triangular solves are fully unrolled over the
STATIC matrix dimension, so every operation is a batched elementwise op that
XLA fuses into a handful of VPU passes — no loops, no dynamic indexing.

Used by ``ops/pnp.py`` (hypothesis GN, pose polish, DLT) and reusable for
any small SPD system (BA Schur blocks are 6x6/3x3 too).
"""
from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A, eps: float = 1e-20):
    """Batched Cholesky of (..., n, n) SPD matrices, n static and small.

    Returns the lower factor as a list-of-lists of (...,) arrays
    (L[i][j] for j <= i) — kept unpacked so the companion solve needs no
    dynamic indexing either. Non-positive pivots are floored at ``eps``
    (finite garbage, caller filters); use ``cholesky_unrolled_flagged`` when
    the caller needs to KNOW the matrix was not SPD.
    """
    return _chol(A, eps)[0]


def cholesky_unrolled_flagged(A, eps: float = 1e-20):
    """Like ``cholesky_unrolled`` but also returns ``ok``: (...,) bool,
    False where any pivot was non-positive (rank-deficient / indefinite
    input — e.g. a RANSAC sample with duplicate points). The factor is
    still finite (pivots floored) so downstream solves stay NaN-free; the
    flag lets the caller zero the step or kill the hypothesis explicitly."""
    return _chol(A, eps)


def _chol(A, eps):
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    ok = None
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                good = s > 0
                ok = good if ok is None else (ok & good)
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    return L, ok


def cho_solve_unrolled(L, b):
    """Solve A x = b given ``cholesky_unrolled`` output; b is (..., n)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def spd_solve(A, b, jitter: float = 0.0):
    """Batched SPD solve of (..., n, n) @ (..., n) with optional ridge."""
    if jitter:
        A = A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)
    return cho_solve_unrolled(cholesky_unrolled(A), b)
