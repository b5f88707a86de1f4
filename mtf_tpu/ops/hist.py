"""Cubic B-spline Parzen histogram kernels.

TPU-native re-design of the reference histogram utilities
(`/root/reference/Utilities/include/mtf/Utilities/histUtils.h:46-260`,
`histUtils.cc`): `bSpl3` window + derivative, cumulative `cumBSpl3` family,
and Parzen marginal/joint histograms used by the MI/CCRE/KLD/SCV appearance
models.

Design: instead of scatter-adds into bins (slow on TPU), every pixel's
fractional bin memberships are materialized as a dense (N, B) weight matrix;
joint histograms are then single (B, N) x (N, B) matmuls on the MXU and all
quantities stay differentiable w.r.t. pixel values through the spline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bspl3(t: Array) -> Array:
    """Cubic B-spline window, support |t| < 2 (histUtils.h `bSpl3`)."""
    a = jnp.abs(t)
    inner = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    outer = (2.0 - a) ** 3 / 6.0
    return jnp.where(a <= 1.0, inner, jnp.where(a < 2.0, outer, 0.0))


def bspl3_grad(t: Array) -> Array:
    """d bspl3 / dt (histUtils.h `bSpl3Grad`)."""
    a = jnp.abs(t)
    s = jnp.sign(t)
    inner = s * (-12.0 * a + 9.0 * a * a) / 6.0
    outer = s * (-3.0 * (2.0 - a) ** 2) / 6.0
    return jnp.where(a <= 1.0, inner, jnp.where(a < 2.0, outer, 0.0))


def cum_bspl3(t: Array) -> Array:
    """Cumulative B-spline: int_{-2}^{t} bspl3(u) du (histUtils.h `cumBSpl3`).

    Smooth step from 0 (t<=-2) to 1 (t>=2); used by CCRE's cumulative
    residual histograms.
    """
    t = jnp.clip(t, -2.0, 2.0)

    def seg_lo(u):  # -2 < u <= -1
        return (u + 2.0) ** 4 / 24.0

    def seg_mid_neg(u):  # -1 < u <= 0  (integral of (4-6u^2-3u^3)/6 from -1)
        return 1.0 / 24.0 + ((4.0 * u - 2.0 * u ** 3 - 0.75 * u ** 4)
                             - (-4.0 + 2.0 - 0.75)) / 6.0

    def seg_mid_pos(u):  # 0 < u <= 1
        return 0.5 + (4.0 * u - 2.0 * u ** 3 + 0.75 * u ** 4) / 6.0

    def seg_hi(u):  # 1 < u <= 2
        return 1.0 - (2.0 - u) ** 4 / 24.0

    return jnp.where(
        t <= -1.0, seg_lo(t),
        jnp.where(t <= 0.0, seg_mid_neg(t),
                  jnp.where(t <= 1.0, seg_mid_pos(t), seg_hi(t))))


def to_bin_coords(pix: Array, n_bins: int, pix_min: float = 0.0,
                  pix_max: float = 255.0, pre_seed: float = 1.0) -> Array:
    """Affine map of pixel values into Parzen bin coordinates
    [pre_seed, n_bins-1-pre_seed] (reference pre-seeding keeps the spline
    support inside the histogram, histUtils.cc)."""
    lo, hi = pre_seed, n_bins - 1.0 - pre_seed
    return (pix - pix_min) / (pix_max - pix_min) * (hi - lo) + lo


def bspl_weights(z: Array, n_bins: int) -> Array:
    """Dense Parzen membership matrix (N, B): w[i, b] = bspl3(z_i - b).

    Replaces the reference's per-pixel 4-bin scatter (`bSplHist` loops,
    histUtils.cc) with a dense TPU-friendly form.
    """
    bins = jnp.arange(n_bins, dtype=z.dtype)
    return bspl3(z[:, None] - bins[None, :])


def cum_bspl_weights(z: Array, n_bins: int) -> Array:
    """Cumulative (survival) membership matrix (N, B):
    w[i, b] = 1 - int_{-2}^{b - z_i} bspl3 — the reference `cumBSpl3`
    orientation (histUtils.h:46-64: 1 for b <= z_i - 2, 0 for
    b >= z_i + 2), i.e. a soft indicator of pixel > bin. CCRE's
    cumulative-residual axis (CCRE.cc:380-398)."""
    bins = jnp.arange(n_bins, dtype=z.dtype)
    return 1.0 - cum_bspl3(bins[None, :] - z[:, None])


def marginal_hist(w: Array, eps: float = 1e-8) -> Array:
    """Normalized marginal histogram (B,) from membership matrix (N, B)."""
    h = jnp.mean(w, axis=0)
    return h / (jnp.sum(h) + eps)


def joint_hist(w0: Array, wt: Array, eps: float = 1e-8) -> Array:
    """Normalized joint histogram (B, B) = w0^T wt / N — one MXU matmul
    (replaces the blockwise TBB joint-hist loops, histUtils_tbb.cc)."""
    j = jnp.dot(w0.T, wt, preferred_element_type=jnp.float32)
    return j / (jnp.sum(j) + eps)


def mutual_information(j: Array, eps: float = 1e-8) -> Array:
    """MI from a normalized joint histogram (B, B)."""
    p0 = jnp.sum(j, axis=1)
    pt = jnp.sum(j, axis=0)
    denom = p0[:, None] * pt[None, :]
    return jnp.sum(j * (jnp.log(j + eps) - jnp.log(denom + eps)))


def entropy(p: Array, eps: float = 1e-8) -> Array:
    return -jnp.sum(p * jnp.log(p + eps))
