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
    if S > 12:
        # the unrolled form emits O(S^3) scalar equations — at spline
        # DOFs (50+) that is a ~40k-equation jaxpr and a multi-GB,
        # multi-minute XLA CPU compile (r3 postmortem: one test held a
        # 20 GB compile for >1 h). High-DOF solves use the LAPACK/XLA
        # custom call; the unrolled win only matters at GN state dims.
        return jnp.linalg.solve(A, b)
    # scalar-register form: every entry is its own traced scalar and the
    # whole factorization + substitutions become ONE fusable elementwise
    # chain. The previous matrix-carry form (.at[].set per column) cost
    # 31 dynamic-update-slices per solve, each a fusion barrier at
    # vmapped fleet scale.
    a = {(i, j): A[..., i, j] for i in range(S) for j in range(i + 1)}
    L, inv = {}, {}
    for j in range(S):
        s = a[(j, j)] - sum(L[(j, k)] * L[(j, k)] for k in range(j))
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[(j, j)] = d
        inv[j] = 1.0 / d
        for i in range(j + 1, S):
            L[(i, j)] = (a[(i, j)] - sum(L[(i, k)] * L[(j, k)]
                                         for k in range(j))) * inv[j]
    y = {}
    for i in range(S):                      # forward substitution L y = b
        y[i] = (b[..., i] - sum(L[(i, k)] * y[k]
                                for k in range(i))) * inv[i]
    x = {}
    for i in reversed(range(S)):            # back substitution L^T x = y
        x[i] = (y[i] - sum(L[(k, i)] * x[k]
                           for k in range(i + 1, S))) * inv[i]
    return jnp.stack([x[i] for i in range(S)], axis=-1)


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
