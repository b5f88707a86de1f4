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
        # the FULLY unrolled form emits O(S^3) scalar equations — at
        # spline DOFs (50+) that is a ~40k-equation jaxpr and a
        # multi-GB, multi-minute XLA CPU compile (r3 postmortem: one
        # test held a 20 GB compile for >1 h). High-DOF solves use the
        # BLOCKED unrolled Cholesky instead (r5, VERDICT r4 #9): 8x8
        # scalar-register diagonal blocks + tiny matmul Schur updates —
        # still no LAPACK custom call (the class whose removal bought
        # RKLT 4.7x in r4), jaxpr size O((S/8)^2).
        return chol_solve_blocked(A, b)
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


def _chol_unrolled_dict(A: Array, S: int):
    """Scalar-register Cholesky of the trailing (S, S) block of `A`
    (batch dims allowed). Returns (L, inv) dicts of per-entry traced
    scalars — the building block shared by the small and blocked
    solvers."""
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
    return L, inv


def chol_solve_blocked(A: Array, b: Array, nb: int = 8) -> Array:
    """Blocked right-looking Cholesky solve for SPD A (..., S, S) with
    S > 12 (Spline/TPS GN systems, 50+ DOF).

    Structure per 8x8 block step: scalar-register factorization of the
    diagonal block (`_chol_unrolled_dict` — a fused elementwise chain,
    no dynamic-update-slices), unrolled triangular panel solves, and
    (nb, nb) matmul Schur updates at HIGHEST precision (the TPU default
    rounds f32 matmul operands to bf16, which at 50 DOF measurably
    perturbs the GN step). No `jnp.linalg.solve` / LAPACK-style custom
    call anywhere — reference anchor SSM/src/Spline.cc / TPS.cc solves.
    """
    S = A.shape[-1]
    nblk = -(-S // nb)
    Sp = nblk * nb
    if Sp != S:
        pad = Sp - S
        batch = A.shape[:-2]
        zcol = jnp.zeros(batch + (S, pad), A.dtype)
        eye = jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype),
                               batch + (pad, pad))
        zrow = jnp.zeros(batch + (pad, S), A.dtype)
        A = jnp.concatenate(
            [jnp.concatenate([A, zcol], -1),
             jnp.concatenate([zrow, eye], -1)], -2)
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (pad,), b.dtype)], -1)

    def blk(i, j):
        return A[..., i * nb:(i + 1) * nb, j * nb:(j + 1) * nb]

    def mmT(X, Y):        # X @ Y^T on trailing dims, full precision
        return jnp.einsum("...ik,...jk->...ij", X, Y,
                          precision=jax.lax.Precision.HIGHEST)

    Lb: dict = {}         # off-diagonal block panels (..., nb, nb)
    diag: dict = {}       # per diagonal block: (L dict, inv dict)
    for k in range(nblk):
        Akk = blk(k, k)
        for j in range(k):
            Akk = Akk - mmT(Lb[(k, j)], Lb[(k, j)])
        Ld, inv = _chol_unrolled_dict(Akk, nb)
        diag[k] = (Ld, inv)
        for i in range(k + 1, nblk):
            P = blk(i, k)
            for j in range(k):
                P = P - mmT(Lb[(i, j)], Lb[(k, j)])
            # solve X Lkk^T = P column-by-column (unrolled over nb)
            cols = {}
            for j in range(nb):
                s = P[..., :, j]
                for m in range(j):
                    s = s - cols[m] * Ld[(j, m)][..., None]
                cols[j] = s * inv[j][..., None]
            Lb[(i, k)] = jnp.stack([cols[j] for j in range(nb)], axis=-1)

    # forward substitution: L y = b (blockwise, unrolled inside blocks)
    yb = {}
    for k in range(nblk):
        r = b[..., k * nb:(k + 1) * nb]
        for j in range(k):
            r = r - jnp.einsum("...ij,...j->...i", Lb[(k, j)], yb[j],
                               precision=jax.lax.Precision.HIGHEST)
        Ld, inv = diag[k]
        y = {}
        for i in range(nb):
            y[i] = (r[..., i] - sum(Ld[(i, m)] * y[m]
                                    for m in range(i))) * inv[i]
        yb[k] = jnp.stack([y[i] for i in range(nb)], axis=-1)

    # back substitution: L^T x = y
    xb = {}
    for k in reversed(range(nblk)):
        r = yb[k]
        for j in range(k + 1, nblk):
            r = r - jnp.einsum("...ji,...j->...i", Lb[(j, k)], xb[j],
                               precision=jax.lax.Precision.HIGHEST)
        Ld, inv = diag[k]
        x = {}
        for i in reversed(range(nb)):
            x[i] = (r[..., i] - sum(Ld[(m, i)] * x[m]
                                    for m in range(i + 1, nb))) * inv[i]
        xb[k] = jnp.stack([x[i] for i in range(nb)], axis=-1)

    out = jnp.concatenate([xb[k] for k in range(nblk)], axis=-1)
    return out[..., :S]


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
