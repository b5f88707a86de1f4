"""Differentiable image patch sampling (gather + interpolation).

TPU-native re-design of the reference pixel-sampling machinery
(`/root/reference/Utilities/include/mtf/Utilities/imgUtils.h:56-217`,
`imgUtils.cc`): `getPixVals` grid sampling with Nearest/Linear/Cubic/CubicBSpl
interpolation and Constant/Replicate borders, plus image gradients and
Hessians at sampled points.

Design: one vectorized gather per interpolation tap (4 taps bilinear,
16 taps cubic) over the flattened image — XLA lowers this to TPU gathers;
the whole patch of N=resx*resy points is sampled in a single fused op.
`sample` carries a custom JVP whose coordinate tangent is the analytic
interpolation derivative, so the entire LK Jacobian chain
(warp -> sample -> similarity) is obtained by `jax.grad` — subsuming the
reference's two hand-written gradient modes (warped-image-gradient vs
warp-of-gradient, ImageBase.h:103-114).

Images are (H, W) or (H, W, C) float arrays; points are (N, 2) in (x, y);
patches are (N, C).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# interpolation kinds (reference enum InterpType, imgUtils.h:56-64)
NEAREST = "nearest"
LINEAR = "linear"
CUBIC = "cubic"          # Catmull-Rom (reference cubic2)
CUBIC_BSPL = "cubic_bspl"

# border handling (reference enum BorderType)
REPLICATE = "replicate"
CONSTANT = "constant"


def _as_hwc(img: Array) -> Array:
    return img[..., None] if img.ndim == 2 else img


def _gather(img_flat: Array, h: int, w: int, xi: Array, yi: Array,
            border: str, cval: float) -> Array:
    """Gather pixel values at integer coords (N,) -> (N, C)."""
    xc = jnp.clip(xi, 0, w - 1)
    yc = jnp.clip(yi, 0, h - 1)
    v = jnp.take(img_flat, yc * w + xc, axis=0)
    if border == CONSTANT:
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = jnp.where(valid[:, None], v, jnp.asarray(cval, v.dtype))
    return v


def _cubic_weights(f: Array, kind: str):
    """Per-point 4-tap weights and their derivatives for offset f in [0,1).

    Catmull-Rom matches the reference's bicubic (imgUtils.h cubic2 path);
    cubic B-spline matches CubicBSpl (approximating, C2-smooth).
    Returns (w, dw): each a tuple of 4 arrays shaped like f.
    """
    f2 = f * f
    f3 = f2 * f
    if kind == CUBIC:
        w0 = 0.5 * (-f + 2.0 * f2 - f3)
        w1 = 0.5 * (2.0 - 5.0 * f2 + 3.0 * f3)
        w2 = 0.5 * (f + 4.0 * f2 - 3.0 * f3)
        w3 = 0.5 * (-f2 + f3)
        d0 = 0.5 * (-1.0 + 4.0 * f - 3.0 * f2)
        d1 = 0.5 * (-10.0 * f + 9.0 * f2)
        d2 = 0.5 * (1.0 + 8.0 * f - 9.0 * f2)
        d3 = 0.5 * (-2.0 * f + 3.0 * f2)
    elif kind == CUBIC_BSPL:
        onemf = 1.0 - f
        w0 = onemf * onemf * onemf / 6.0
        w1 = (4.0 - 6.0 * f2 + 3.0 * f3) / 6.0
        w2 = (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) / 6.0
        w3 = f3 / 6.0
        d0 = -0.5 * onemf * onemf
        d1 = (-12.0 * f + 9.0 * f2) / 6.0
        d2 = (3.0 + 6.0 * f - 9.0 * f2) / 6.0
        d3 = 0.5 * f2
    else:  # pragma: no cover
        raise ValueError(f"unknown cubic kind {kind!r}")
    return (w0, w1, w2, w3), (d0, d1, d2, d3)


def _sample_val_grad(img: Array, pts: Array, kind: str, border: str,
                     cval: float, need_grad: bool):
    """Core: value (N, C) and, if need_grad, analytic d/d(x,y) (N, C, 2)."""
    if kind.endswith(_MM_SUFFIX):
        # dense-matmul path (full image; the LK hot loop passes an
        # explicit crop via sample_dense directly)
        val, grad = sample_dense(img, pts, kind[: -len(_MM_SUFFIX)],
                                 cval=cval)
        return val, (grad if need_grad else None)
    img = _as_hwc(img)
    h, w, c = img.shape
    img_flat = img.reshape(h * w, c)
    x, y = pts[:, 0], pts[:, 1]

    if kind == NEAREST:
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        val = _gather(img_flat, h, w, xi, yi, border, cval)
        grad = jnp.zeros(val.shape + (2,), val.dtype) if need_grad else None
        return val, grad

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[:, None]  # (N, 1)
    fy = (y - y0f)[:, None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if kind == LINEAR:
        g = partial(_gather, img_flat, h, w, border=border, cval=cval)
        v00 = g(x0, y0)
        v01 = g(x0 + 1, y0)
        v10 = g(x0, y0 + 1)
        v11 = g(x0 + 1, y0 + 1)
        top = v00 * (1.0 - fx) + v01 * fx
        bot = v10 * (1.0 - fx) + v11 * fx
        val = top * (1.0 - fy) + bot * fy
        if not need_grad:
            return val, None
        dx = (v01 - v00) * (1.0 - fy) + (v11 - v10) * fy
        dy = bot - top
        return val, jnp.stack([dx, dy], axis=-1)

    # 4x4 separable cubic
    (wx, dwx) = _cubic_weights(fx, kind)
    (wy, dwy) = _cubic_weights(fy, kind)
    g = partial(_gather, img_flat, h, w, border=border, cval=cval)
    rows = []
    for j in range(4):
        taps = [g(x0 + i - 1, y0 + j - 1) for i in range(4)]
        rows.append(taps)
    # horizontal pass: value and d/dx per row
    row_v = [sum(rows[j][i] * wx[i] for i in range(4)) for j in range(4)]
    val = sum(row_v[j] * wy[j] for j in range(4))
    if not need_grad:
        return val, None
    row_dx = [sum(rows[j][i] * dwx[i] for i in range(4)) for j in range(4)]
    dx = sum(row_dx[j] * wy[j] for j in range(4))
    dy = sum(row_v[j] * dwy[j] for j in range(4))
    return val, jnp.stack([dx, dy], axis=-1)


@partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def sample(img: Array, pts: Array, kind: str = LINEAR,
           border: str = REPLICATE, cval: float = 0.0) -> Array:
    """Sample `img` at subpixel points `pts` -> patch (N, C).

    Differentiable in both `img` (linear) and `pts` (analytic interpolation
    derivative via custom JVP). Reference: ``utils::getPixVals``
    (imgUtils.h:140-151) + gradient semantics of ImageBase.h:103-114.
    """
    val, _ = _sample_val_grad(img, pts, kind, border, cval, need_grad=False)
    return val


@sample.defjvp
def _sample_jvp(kind, border, cval, primals, tangents):
    img, pts = primals
    dimg, dpts = tangents
    val, grad = _sample_val_grad(img, pts, kind, border, cval, need_grad=True)
    out = jnp.einsum("ncd,nd->nc", grad, jnp.asarray(dpts, val.dtype))
    out = out + sample(jnp.asarray(dimg, val.dtype), pts, kind, border, 0.0)
    return val, out


def sample_with_grad(img: Array, pts: Array, kind: str = LINEAR,
                     border: str = REPLICATE, cval: float = 0.0):
    """One fused pass -> (patch (N, C), grad (N, C, 2)).

    The LK hot path needs both the warped pixel values and the interpolant
    gradient at the same points; fusing them shares the neighborhood
    gather (the reference computes them in separate updatePixVals /
    updatePixGrad passes — ImageBase.cc)."""
    return _sample_val_grad(img, pts, kind, border, cval, need_grad=True)


# ---------------------------------------------------------------------------
# Dense (matmul) interpolation — the TPU gather replacement.
#
# XLA gathers on TPU run at ~1 element/cycle; a 50x50 patch with 4-16 taps
# per point per LK iteration leaves the MXU idle and the kernel
# gather-bound (measured: the whole fleet update is flat at ~1.3 kfps).
# Interpolation kernels have compact support, so sampling is a *banded*
# linear map:  patch[n] = wy_n^T . IMG . wx_n  with wx/wy built densely
# from broadcasted iota (VPU elementwise) — turning the irregular gather
# into two MXU contractions. With a dynamic-slice crop around the tracked
# region the contraction is (N, Hc) x (Hc, Wc) x (Wc,) per point batch:
# hundreds of MFLOPs, microseconds on the MXU. Select with the
# "<kind>_mm" interp names (e.g. "linear_mm"); border is always
# 'replicate' via coordinate clamping.
# ---------------------------------------------------------------------------

_MM_SUFFIX = "_mm"
LINEAR_MM = "linear_mm"
CUBIC_MM = "cubic_mm"
CUBIC_BSPL_MM = "cubic_bspl_mm"


def _kernel_weights_dense(t: Array, kind: str):
    """(phi(t), phi'(t)) for tap offsets t = k - x (any shape), compact
    support: linear |t|<1, cubics |t|<2."""
    a = jnp.abs(t)
    s = jnp.sign(t)
    if kind == LINEAR:
        w = jnp.maximum(0.0, 1.0 - a)
        dphi = jnp.where(a < 1.0, -s, 0.0)
        return w, dphi
    a2, a3 = a * a, a * a * a
    if kind == CUBIC:  # Catmull-Rom (alpha = -1/2)
        w_in = 1.5 * a3 - 2.5 * a2 + 1.0
        w_out = -0.5 * a3 + 2.5 * a2 - 4.0 * a + 2.0
        d_in = 4.5 * a2 - 5.0 * a          # d phi / d|t|
        d_out = -1.5 * a2 + 5.0 * a - 4.0
    elif kind == CUBIC_BSPL:
        w_in = 0.5 * a3 - a2 + 2.0 / 3.0
        w_out = -(a - 2.0) ** 3 / 6.0
        d_in = 1.5 * a2 - 2.0 * a
        d_out = -0.5 * (a - 2.0) ** 2
    else:
        raise ValueError(f"unknown dense kind {kind!r}")
    w = jnp.where(a < 1.0, w_in, jnp.where(a < 2.0, w_out, 0.0))
    dphi = jnp.where(a < 1.0, d_in, jnp.where(a < 2.0, d_out, 0.0)) * s
    return w, dphi


def _axis_weights(coord: Array, size: int, kind: str):
    """(N, size) value and d/dcoord weight matrices for one axis."""
    lo = 0.001 if kind == LINEAR else 1.001
    hi = (size - 1.001) if kind == LINEAR else (size - 2.001)
    c = jnp.clip(coord, lo, hi)                       # replicate border
    k = jax.lax.broadcasted_iota(jnp.float32, (coord.shape[0], size), 1)
    t = k - c[:, None]
    w, dphi = _kernel_weights_dense(t, kind)
    # d/dcoord phi(k - coord) = -phi'(t)
    return w, -dphi


def sample_dense_parts(img: Array, pts: Array, kind: str = LINEAR,
                       crop: int | None = None, cval: float = 0.0,
                       compute_dtype=None):
    """`sample_dense` without the (N, C, 2) gradient stack: returns
    (val, dx, dy), each (N, C). The trailing size-2 axis of the stacked
    form forces degenerate T(2,128) tile layouts on everything downstream
    of the LK Jacobian chain (measured ~0.3 ms/iter of copies + badly
    tiled fusions at fleet scale) — hot paths consume the parts and build
    J = dx*Jx + dy*Jy directly."""
    val, grad = sample_dense(img, pts, kind, crop, cval, compute_dtype,
                             need_grad=True, _stack=False)
    return val, grad[0], grad[1]


def sample_dense(img: Array, pts: Array, kind: str = LINEAR,
                 crop: int | None = None, cval: float = 0.0,
                 compute_dtype=None, need_grad: bool = True, _stack=True,
                 precision=None):
    """Matmul-form sampling -> (patch (N, C), grad (N, C, 2) | None).

    `crop`: static window size; the window is dynamic-sliced around the
    points (replicate-clamped at its edge). None = full image.
    `compute_dtype`: jnp.bfloat16 runs the contractions on the bf16 MXU
    path (f32 accumulation) — ~0.5 intensity-level quantization on 8-bit
    imagery, halves the matmul cost.
    `need_grad=False` skips the dWx contraction — HALF the stage-1 MXU
    cost for value-only consumers (LP / PF / NN sampling).
    """
    img = _as_hwc(img)
    h, w, c = img.shape
    x, y = pts[:, 0], pts[:, 1]
    if crop is not None and (crop < h or crop < w):
        hc, wc = min(crop, h), min(crop, w)
        x0 = jnp.clip(jnp.floor(jnp.min(x)) - 2.0, 0.0, float(w - wc))
        y0 = jnp.clip(jnp.floor(jnp.min(y)) - 2.0, 0.0, float(h - hc))
        sub = jax.lax.dynamic_slice(
            img, (y0.astype(jnp.int32), x0.astype(jnp.int32), 0),
            (hc, wc, c))
        x = x - x0
        y = y - y0
    else:
        sub, hc, wc = img, h, w
    Wx, dWx = _axis_weights(x, wc, kind)              # (N, Wc)
    Wy, dWy = _axis_weights(y, hc, kind)              # (N, Hc)
    if compute_dtype is not None:
        sub = sub.astype(compute_dtype)
        Wx, dWx = Wx.astype(compute_dtype), dWx.astype(compute_dtype)
        Wy, dWy = Wy.astype(compute_dtype), dWy.astype(compute_dtype)
    # two MXU contractions + cheap reuse for the gradients
    tmp = jnp.einsum("nw,hwc->nhc", Wx, sub,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    val = jnp.einsum("nh,nhc->nc", Wy, tmp,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    if not need_grad:
        return val, None
    tmp_dx = jnp.einsum("nw,hwc->nhc", dWx, sub,
                        preferred_element_type=jnp.float32,
                     precision=precision)
    dx = jnp.einsum("nh,nhc->nc", Wy, tmp_dx,
                    preferred_element_type=jnp.float32,
                     precision=precision)
    dy = jnp.einsum("nh,nhc->nc", dWy, tmp,
                    preferred_element_type=jnp.float32,
                     precision=precision)
    if not _stack:
        return val, (dx, dy)
    return val, jnp.stack([dx, dy], axis=-1)


def sample_dense_blocked(img: Array, pts: Array, kind: str = LINEAR,
                         crop: int = 64, grid_shape: tuple[int, int] = (50, 50),
                         blocks: tuple[int, int] = (2, 2),
                         compute_dtype=None):
    """Tiled dense sampling: split the (resy, resx) point grid into
    `blocks` spatial tiles and run `sample_dense` with a per-tile crop.

    The dense contraction costs N*Hc*Wc MACs; each tile only spans
    ~1/blocks of the patch, so a (2, 2) split with half the crop cuts the
    matmul work ~4x while keeping MXU-friendly shapes. `crop` here is the
    PER-TILE window — it must cover the largest tile span plus the interp
    margin. Points must be the row-major (y outer) grid the SMs use
    (`unit_square_grid`).
    """
    by, bx = blocks
    ry, rx = grid_shape
    if ry % by or rx % bx:
        raise ValueError(f"grid {grid_shape} not divisible by {blocks}")
    bh, bw = ry // by, rx // bx
    p = pts.reshape(by, bh, bx, bw, 2).transpose(0, 2, 1, 3, 4) \
           .reshape(by * bx, bh * bw, 2)
    val, grad = jax.vmap(
        lambda pb: sample_dense(img, pb, kind, crop,
                                compute_dtype=compute_dtype))(p)
    c = val.shape[-1]
    val = val.reshape(by, bx, bh, bw, c).transpose(0, 2, 1, 3, 4) \
             .reshape(ry * rx, c)
    grad = grad.reshape(by, bx, bh, bw, c, 2).transpose(0, 2, 1, 3, 4, 5) \
               .reshape(ry * rx, c, 2)
    return val, grad


def sample_grad(img: Array, pts: Array, kind: str = LINEAR,
                border: str = REPLICATE, cval: float = 0.0) -> Array:
    """Analytic image gradient at sampled points -> (N, C, 2).

    The TPU analog of ``ImageBase::updatePixGrad`` /
    ``utils::getImgGrad`` (imgUtils.h:164-189): the derivative of the
    interpolant itself (equivalent to the reference's warped central
    difference in the small-eps limit).
    """
    _, grad = _sample_val_grad(img, pts, kind, border, cval, need_grad=True)
    return grad


def sample_grad_fd(img: Array, pts: Array, eps: float = 0.5,
                   kind: str = LINEAR, border: str = REPLICATE,
                   cval: float = 0.0) -> Array:
    """Central-difference image gradient at points -> (N, C, 2).

    Matches the reference's grad_pts path (``updateGradPts`` + getImgGrad,
    StateSpaceModel grad_pts protocol) with sampling offset ``eps``.
    """
    ex = jnp.array([eps, 0.0], pts.dtype)
    ey = jnp.array([0.0, eps], pts.dtype)
    gx = sample(img, pts + ex, kind, border, cval) - sample(img, pts - ex, kind, border, cval)
    gy = sample(img, pts + ey, kind, border, cval) - sample(img, pts - ey, kind, border, cval)
    return jnp.stack([gx, gy], axis=-1) / (2.0 * eps)


def sample_hess_fd(img: Array, pts: Array, eps: float = 0.5,
                   kind: str = LINEAR, border: str = REPLICATE,
                   cval: float = 0.0) -> Array:
    """Finite-difference image Hessian at points -> (N, C, 2, 2).

    Reference: ``ImageBase::initializePixHess`` / ``utils::getImgHess``
    (imgUtils.h:190-217).
    """
    ex = jnp.array([eps, 0.0], pts.dtype)
    ey = jnp.array([0.0, eps], pts.dtype)
    s = partial(sample, img, kind=kind, border=border, cval=cval)
    c = s(pts)
    dxx = (s(pts + ex) + s(pts - ex) - 2.0 * c) / (eps * eps)
    dyy = (s(pts + ey) + s(pts - ey) - 2.0 * c) / (eps * eps)
    dxy = (s(pts + ex + ey) + s(pts - ex - ey)
           - s(pts + ex - ey) - s(pts - ex + ey)) / (4.0 * eps * eps)
    row0 = jnp.stack([dxx, dxy], axis=-1)
    row1 = jnp.stack([dxy, dyy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
