"""Small-matrix solves that lower to pure XLA HLO.

`jnp.linalg.solve` on TPU lowers to an LU custom call — measured at
~505 us per LK iteration for a fleet of 256 8x8 systems (profile:
custom-call.34), i.e. ~25% of the whole iteration. For the S x S
Gauss-Newton systems (S <= ~14) an unrolled Cholesky is a handful of
fused VPU ops and vmaps cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def chol_solve_small(A: Array, b: Array, jitter: float = 0.0) -> Array:
    """Solve A x = b for SPD A (S, S) with an UNROLLED Cholesky.

    S must be small and static (Gauss-Newton state dims). No pivoting —
    intended for damped/regularized SPD systems. Batched via vmap.
    """
    S = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(S, dtype=A.dtype)
    # Cholesky: L lower-triangular, A = L L^T (unrolled, static S)
    L = jnp.zeros_like(A)
    for j in range(S):
        s = A[j, j] - jnp.sum(L[j, :j] * L[j, :j])
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L = L.at[j, j].set(d)
        if j + 1 < S:
            r = (A[j + 1:, j] - L[j + 1:, :j] @ L[j, :j]) / d
            L = L.at[j + 1:, j].set(r)
    # forward substitution L y = b
    y = jnp.zeros_like(b)
    for i in range(S):
        y = y.at[i].set((b[i] - L[i, :i] @ y[:i]) / L[i, i])
    # back substitution L^T x = y
    x = jnp.zeros_like(b)
    for i in reversed(range(S)):
        x = x.at[i].set((y[i] - L[i + 1:, i] @ x[i + 1:]) / L[i, i])
    return x


def neg_def_solve(H: Array, g: Array) -> Array:
    """x = -H^{-1} g for negative-definite H (GN Hessian at a maximum):
    solves (-H) x = g by unrolled Cholesky."""
    return chol_solve_small(-H, g)


def solve2x2(H: Array, b: Array, eps: float = 1e-12) -> Array:
    """Closed-form 2x2 solve (grid/flow translation systems)."""
    det = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    x0 = (H[1, 1] * b[0] - H[0, 1] * b[1]) / det
    x1 = (H[0, 0] * b[1] - H[1, 0] * b[0]) / det
    return jnp.stack([x0, x1])
