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


def inv3x3(M: Array) -> Array:
    """Closed-form adjugate inverse of a 3x3 (batched via vmap).

    `jnp.linalg.inv` lowers to an LU custom call on TPU — vmapped over
    RANSAC hypotheses / fleet trackers those calls dominated the RKLT
    update (r4 trace: ~70% of device time in linalg custom calls). The
    cofactor form is ~40 fused VPU ops."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    rows = [
        [A, -(b * i - c * h), b * f - c * e],
        [B, a * i - c * g, -(a * f - c * d)],
        [C, -(a * h - b * g), a * e - b * d],
    ]
    out = jnp.stack([jnp.stack([rows[r][cc] * inv_det for cc in range(3)],
                               axis=-1) for r in range(3)], axis=-2)
    return out


def lstsq_normal(A: Array, b: Array, jitter: float = 1e-10) -> Array:
    """Least-squares via normal equations + unrolled Cholesky — the
    TPU-native replacement for `jnp.linalg.lstsq` on small-unknown
    systems (DLT fits: <= ~8 unknowns; lstsq lowers to SVD/QR custom
    calls). b may be (N,) or (N, K)."""
    AtA = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.matmul(A.T, b, precision=jax.lax.Precision.HIGHEST)
    scale = jnp.trace(AtA) / AtA.shape[0]
    AtA = AtA + (jitter * scale) * jnp.eye(AtA.shape[0], dtype=AtA.dtype)
    if Atb.ndim == 1:
        return chol_solve_small(AtA, Atb)
    return jnp.stack([chol_solve_small(AtA, Atb[:, k])
                      for k in range(Atb.shape[1])], axis=-1)
