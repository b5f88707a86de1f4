"""Homogeneous-coordinate warp algebra.

TPU-native re-design of the reference warp utilities
(`/root/reference/Utilities/include/mtf/Utilities/warpUtils.h:36-141`,
`Utilities/src/warpUtils.cc`): homogenize/dehomogenize, DLT estimators
(homography/affine/similitude), point normalization, and grid generation
from region corners.

Conventions (differ deliberately from the Eigen reference):
  * points are ``(N, 2)`` arrays in ``(x, y)`` order (row-major batches,
    TPU lane-friendly), not Eigen ``2xN`` column matrices;
  * corners are ``(4, 2)`` in MTF order ul, ur, lr, ll
    (cf. GT file layout ``runMTF.cc:359``);
  * everything is a pure jittable function of f32 arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def homogenize(pts: Array) -> Array:
    """(..., 2) -> (..., 3) by appending ones. Ref: warpUtils.h:44."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def dehomogenize(pts_h: Array) -> Array:
    """(..., 3) -> (..., 2) perspective division. Ref: warpUtils.h:45."""
    return pts_h[..., :2] / pts_h[..., 2:3]


def apply_warp(w: Array, pts: Array) -> Array:
    """Apply a 3x3 warp to (..., 2) points: dehom(W @ hom(p)).

    precision=HIGHEST: TPU matmuls round f32 operands to bf16 by default,
    and warped point COORDS live at image scale (bf16 ulp at x=500 is
    2 px) — the r4 on-chip GT audit measured a ~1 px systematic tracking
    bias from exactly this (log/dbg_chipacc*_r4.log). The dot is (N, 3)
    x (3, 3) — full precision costs nothing measurable."""
    return dehomogenize(jnp.matmul(homogenize(pts), w.T,
                                   precision=jax.lax.Precision.HIGHEST))


def unit_square_corners(dtype=jnp.float32) -> Array:
    """Centered unit square corners (ul, ur, lr, ll), y pointing down.

    The canonical template frame every SSM maps into the image
    (analog of ``warpUtils::getNormUnitSquarePts``, warpUtils.h:108-124).
    """
    return jnp.array(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], dtype=dtype
    )


def unit_square_grid(resx: int, resy: int, dtype=jnp.float32) -> Array:
    """(resy*resx, 2) uniform grid over the centered unit square.

    Row-major (y outer, x inner) to match patch flattening everywhere.
    """
    xs = jnp.linspace(-0.5, 0.5, resx, dtype=dtype)
    ys = jnp.linspace(-0.5, 0.5, resy, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (resy, resx)
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


def normalize_pts(pts: Array, eps: float = 1e-12):
    """Hartley normalization: returns (pts_n, T) with ``pts_n = apply_warp(T, pts)``.

    Centroid at origin, mean distance sqrt(2). Ref: warpUtils.h:102-103.
    """
    c = jnp.mean(pts, axis=0)
    d = jnp.mean(jnp.linalg.norm(pts - c, axis=-1))
    s = jnp.sqrt(2.0) / (d + eps)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return (pts - c) * s, T


def homography_dlt(src: Array, dst: Array, weights: Array | None = None) -> Array:
    """Direct linear transform homography fit: W s.t. dst ~ W @ src.

    Normalized DLT via SVD of the (2N, 9) design matrix; optional per-point
    weights (for robust refits). Ref: ``warpUtils::computeHomographyDLT``
    (warpUtils.h:67-70), re-designed as a single batched SVD so it can be
    vmapped over RANSAC hypotheses.
    """
    src_n, Ts = normalize_pts(src)
    dst_n, Td = normalize_pts(dst)
    x, y = src_n[:, 0], src_n[:, 1]
    X, Y = dst_n[:, 0], dst_n[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    # rows: [ x y 1 0 0 0 -Xx -Xy -X ; 0 0 0 x y 1 -Yx -Yy -Y ]
    r1 = jnp.stack([x, y, o, z, z, z, -X * x, -X * y, -X], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -Y * x, -Y * y, -Y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 9)
    if weights is not None:
        wsq = jnp.sqrt(jnp.maximum(weights, 0.0))
        A = A * jnp.concatenate([wsq, wsq])[:, None]
    # TPU-native solve (r4): the earlier SVD formulation (nullspace of
    # the (2N, 9) design) lowers to a LAPACK-style custom call that
    # dominated the vmapped-RANSAC profile (~70% of the RKLT update).
    # After Hartley normalization the homography is near-similarity, so
    # the h22 = 1 gauge is always valid and the fit becomes an 8x8
    # normal-equation solve on the unrolled Cholesky: AtA[:8,:8] h8 =
    # -AtA[:8,8]. Exact on minimal 4-point samples (unique interpolant);
    # for overdetermined refits it is the standard inhomogeneous-DLT
    # least squares (gauge differs from ||h||=1 by O(residual^2)).
    from mtf_tpu.ops.linalg import chol_solve_small, inv3x3
    AtA = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    scale = jnp.trace(AtA) / 9.0
    M = AtA[:8, :8] + (1e-9 * scale) * jnp.eye(8, dtype=A.dtype)
    h8 = chol_solve_small(M, -AtA[:8, 8])
    h = jnp.concatenate([h8, jnp.ones((1,), A.dtype)])
    Wn = h.reshape(3, 3)
    W = inv3x3(Td) @ Wn @ Ts
    return W / W[2, 2]


def affine_dlt(src: Array, dst: Array, weights: Array | None = None) -> Array:
    """Least-squares affine fit (3x3 with last row [0,0,1]).

    Ref: ``warpUtils::computeAffineDLT`` (warpUtils.h:71-74).
    """
    from mtf_tpu.ops.linalg import lstsq_normal
    A = homogenize(src)  # (N, 3)
    if weights is not None:
        wsq = jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]
        sol = lstsq_normal(A * wsq, dst * wsq)  # (3, 2)
    else:
        sol = lstsq_normal(A, dst)
    W = jnp.eye(3, dtype=src.dtype)
    return W.at[:2, :].set(sol.T)


def similitude_dlt(src: Array, dst: Array, weights: Array | None = None) -> Array:
    """LS similitude fit [[a,-b,tx],[b,a,ty],[0,0,1]].

    Ref: ``warpUtils::computeSimilitudeDLT`` (warpUtils.h:75-78).
    """
    x, y = src[:, 0], src[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, -y, o, z], axis=-1)
    r2 = jnp.stack([y, x, z, o], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 4)
    b = jnp.concatenate([dst[:, 0], dst[:, 1]])
    if weights is not None:
        wsq = jnp.sqrt(jnp.maximum(weights, 0.0))
        wsq2 = jnp.concatenate([wsq, wsq])
        A = A * wsq2[:, None]
        b = b * wsq2
    from mtf_tpu.ops.linalg import lstsq_normal
    a, bb, tx, ty = lstsq_normal(A, b)
    W = jnp.eye(3, dtype=src.dtype)
    return W.at[0, 0].set(a).at[0, 1].set(-bb).at[0, 2].set(tx) \
            .at[1, 0].set(bb).at[1, 1].set(a).at[1, 2].set(ty)


def homography_from_unit_square(corners: Array) -> Array:
    """Closed-form homography mapping the *centered* unit square
    (`unit_square_corners`) onto 4 corner points (ul, ur, lr, ll).

    The classical projective texture-mapping formula — fully differentiable
    (unlike the SVD DLT), used by the corner-based SSM (reference CBH.cc)
    and fast paths that always start from the canonical square.
    """
    # map centered square -> [0,1]^2 square first
    A = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]],
                  corners.dtype)
    # corners of [0,1]^2 in order (0,0),(1,0),(1,1),(0,1) = ul,ur,lr,ll
    x0, y0 = corners[0, 0], corners[0, 1]
    x1, y1 = corners[1, 0], corners[1, 1]
    x2, y2 = corners[2, 0], corners[2, 1]
    x3, y3 = corners[3, 0], corners[3, 1]
    dx1, dx2, dx3 = x1 - x2, x3 - x2, x0 - x1 + x2 - x3
    dy1, dy2, dy3 = y1 - y2, y3 - y2, y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    g = (dx3 * dy2 - dx2 * dy3) / den
    h = (dx1 * dy3 - dx3 * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    H = jnp.stack([jnp.stack([a, b, x0]),
                   jnp.stack([d, e, y0]),
                   jnp.stack([g, h, jnp.ones_like(g)])])
    # W(centered pt) = H([0,1]^2 pt) = H @ A @ centered_h
    return H @ A


def grid_from_corners(corners: Array, resx: int, resy: int) -> Array:
    """(resy*resx, 2) sampling grid inside a corner quadrilateral.

    Warps the uniform unit-square grid through the homography that maps the
    unit square onto ``corners`` — the analog of the reference's
    grid-from-corners path (``utils::getPtsFromCorners``; homography variant
    of warpUtils.h:108-124). Perspective-correct for non-parallelogram quads.
    """
    H = homography_dlt(unit_square_corners(corners.dtype), corners)
    return apply_warp(H, unit_square_grid(resx, resy, corners.dtype))


def corners_mtf_to_pts(corners_2x4: Array) -> Array:
    """MTF (2, 4) corner matrix -> (4, 2) points."""
    return corners_2x4.T


def pts_to_corners_mtf(corners_4x2: Array) -> Array:
    """(4, 2) corner points -> MTF (2, 4) corner matrix."""
    return corners_4x2.T


def center_of_corners(corners_4x2: Array) -> Array:
    return jnp.mean(corners_4x2, axis=0)
