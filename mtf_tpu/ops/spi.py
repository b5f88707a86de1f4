"""Selective Pixel Integration (SPI) masks.

Re-designs `/root/reference/Utilities/src/spiUtils.cc` (262 LoC;
`spiUtils.h:12-60`): per-pixel weights that gate which template pixels
contribute to the Jacobian/Hessian of a registration step — the
reference's occlusion/outlier-robustness mechanism (wired into ESM,
`SM/src/NT/ESM.cc:40-66,442-480`, and RKLT's grid-inlier feedback).

All masks are returned as float (N,) weights in [0, 1] over the patch
grid so they can simply scale gradient rows (no boolean gathers — TPU
prefers masked math to dynamic shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pix_diff_mask(template: Array, patch: Array, thresh: float = 0.2,
                  soft: float = 10.0) -> Array:
    """PixDiff: keep pixels whose relative intensity difference from the
    template is below `thresh` (spiUtils.h PixDiff).

    template/patch: (N, C). Returns (N,) weights; `soft` controls the
    sigmoid sharpness (hard threshold as soft -> inf).
    """
    t = template.reshape(template.shape[0], -1)
    p = patch.reshape(patch.shape[0], -1)
    scale = jnp.maximum(jnp.max(jnp.abs(t)), 1e-6)
    rel = jnp.mean(jnp.abs(p - t), axis=-1) / scale
    return jax.nn.sigmoid(soft * (thresh - rel) / thresh)


def _patch_gradients(patch: Array, resy: int, resx: int):
    """Central-difference gradients of an (N, C) patch on its grid."""
    img = patch.reshape(resy, resx, -1)
    gx = jnp.gradient(img, axis=1)
    gy = jnp.gradient(img, axis=0)
    return gx, gy


def gradient_mask(patch: Array, resy: int, resx: int,
                  thresh: float = 0.05, soft: float = 10.0) -> Array:
    """Gradient: keep pixels with sufficient gradient magnitude
    (spiUtils.h Gradient) — textureless pixels carry no alignment
    information and only add noise to J^T J."""
    gx, gy = _patch_gradients(patch, resy, resx)
    mag = jnp.sqrt(jnp.sum(gx * gx + gy * gy, axis=-1)).reshape(-1)
    scale = jnp.maximum(jnp.max(mag), 1e-6)
    return jax.nn.sigmoid(soft * (mag / scale - thresh) / max(thresh, 1e-6))


def gftt_mask(patch: Array, resy: int, resx: int, thresh: float = 0.01,
              window: int = 3, soft: float = 10.0) -> Array:
    """GFTT: min-eigenvalue of the local structure tensor (good-features-
    to-track criterion, spiUtils.h GFTT), box-filtered over `window`."""
    gx, gy = _patch_gradients(patch, resy, resx)
    gx = jnp.sum(gx, axis=-1)
    gy = jnp.sum(gy, axis=-1)
    xx, xy, yy = gx * gx, gx * gy, gy * gy

    def box(a):
        k = jnp.ones((window, window), a.dtype) / (window * window)
        return jax.scipy.signal.convolve2d(a, k, mode="same")

    xx, xy, yy = box(xx), box(xy), box(yy)
    tr = xx + yy
    det = xx * yy - xy * xy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    min_eig = (tr / 2 - disc).reshape(-1)
    scale = jnp.maximum(jnp.max(min_eig), 1e-6)
    return jax.nn.sigmoid(
        soft * (min_eig / scale - thresh) / max(thresh, 1e-6))


SPI_REGISTRY = {
    "pix_diff": pix_diff_mask,
    "gradient": gradient_mask,
    "gftt": gftt_mask,
}


def compute_spi_mask(kind: str, template: Array, patch: Array,
                     resy: int, resx: int, thresh: float) -> Array:
    """Dispatch on the reference's spi_type keys."""
    k = kind.lower()
    if k in ("pix_diff", "pixdiff", "diff"):
        return pix_diff_mask(template, patch, thresh)
    if k in ("gradient", "grad"):
        return gradient_mask(patch, resy, resx, thresh)
    if k == "gftt":
        return gftt_mask(patch, resy, resx, thresh)
    raise ValueError(f"unknown SPI type {kind!r}")
