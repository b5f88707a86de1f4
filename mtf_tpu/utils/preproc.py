"""Frame preprocessing chain.

Re-designs the reference preprocessing layer
(`/root/reference/Utilities/src/preprocUtils.cc`, pipeline keys
`pipeline.h:178-205`: raw none gauss med box bil aniso sobel + dtype
conversion, resize, histogram equalization). All filters are jittable
jnp/lax ops on (H, W[, C]) float32 frames.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def to_gray(frame: Array) -> Array:
    """RGB -> luminance (reference dtype/channel conversion)."""
    if frame.ndim == 2:
        return frame
    if frame.shape[-1] == 1:
        return frame[..., 0]
    w = jnp.asarray([0.299, 0.587, 0.114], frame.dtype)
    return frame @ w


def _conv2(img: Array, kernel: Array) -> Array:
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    c = x.shape[-1]
    x = jnp.moveaxis(x, -1, 0)[None]
    kh, kw = kernel.shape
    kern = jnp.zeros((c, 1, kh, kw), x.dtype) + kernel[None, None]
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        feature_group_count=c)
    y = jnp.moveaxis(y[0], 0, -1)
    return y[..., 0] if squeeze else y


def gaussian_kernel(size: int = 5, sigma: float = 1.0) -> Array:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-r * r / (2 * sigma * sigma))
    k = k / jnp.sum(k)
    return k[:, None] * k[None, :]


def gaussian_filter(frame: Array, size: int = 5, sigma: float = 1.0) -> Array:
    return _conv2(frame, gaussian_kernel(size, sigma))


def box_filter(frame: Array, size: int = 3) -> Array:
    k = jnp.full((size, size), 1.0 / (size * size), jnp.float32)
    return _conv2(frame, k)


def median_filter(frame: Array, size: int = 3) -> Array:
    squeeze = frame.ndim == 2
    x = frame[..., None] if squeeze else frame
    h, w, c = x.shape
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    # gather size*size shifted views and take the median across them
    views = jnp.stack([xp[i:i + h, j:j + w] for i in range(size)
                       for j in range(size)])
    y = jnp.median(views, axis=0)
    return y[..., 0] if squeeze else y


def sobel_filter(frame: Array) -> Array:
    """Gradient magnitude (reference sobel preproc)."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    gx = _conv2(frame, kx)
    gy = _conv2(frame, kx.T)
    return jnp.sqrt(gx * gx + gy * gy)


def descriptor_fields(frame: Array, sigma: float = 1.5) -> Array:
    """Descriptor Fields (Crivellaro & Lepetit, CVPR'14 — the method the
    reference bundles as `ThirdParty/DFT`, 2941 LoC): the image gradient
    split into its positive/negative x/y parts, each Gaussian-smoothed —
    a 4-channel representation whose SSD alignment is robust to strong
    illumination changes and specularities. Tracking DFT = any LK SM on
    this (H, W, 4) frame (the multi-channel AM machinery)."""
    g = to_gray(frame) if frame.ndim == 3 else frame
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    gx = _conv2(g, kx)
    gy = _conv2(g, kx.T)
    parts = [jnp.maximum(gx, 0.0), jnp.maximum(-gx, 0.0),
             jnp.maximum(gy, 0.0), jnp.maximum(-gy, 0.0)]
    size = int(2 * round(2 * sigma) + 1)
    sm = [gaussian_filter(p, size=size, sigma=sigma) for p in parts]
    return jnp.stack(sm, axis=-1)


def bilateral_filter(frame: Array, size: int = 5, sigma_s: float = 2.0,
                     sigma_r: float = 25.0) -> Array:
    squeeze = frame.ndim == 2
    x = frame[..., None] if squeeze else frame
    h, w, c = x.shape
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    acc = jnp.zeros_like(x)
    norm = jnp.zeros_like(x)
    for i in range(size):
        for j in range(size):
            shift = xp[i:i + h, j:j + w]
            ds2 = (i - pad) ** 2 + (j - pad) ** 2
            ws = jnp.exp(-ds2 / (2 * sigma_s * sigma_s))
            wr = jnp.exp(-(shift - x) ** 2 / (2 * sigma_r * sigma_r))
            wgt = ws * wr
            acc = acc + wgt * shift
            norm = norm + wgt
    y = acc / jnp.maximum(norm, 1e-12)
    return y[..., 0] if squeeze else y


def anisotropic_diffusion(frame: Array, n_iters: int = 5,
                          kappa: float = 30.0, lam: float = 0.25) -> Array:
    """Perona-Malik diffusion (reference aniso preproc)."""
    def step(_, u):
        dn = jnp.roll(u, 1, 0) - u
        ds = jnp.roll(u, -1, 0) - u
        de = jnp.roll(u, -1, 1) - u
        dw = jnp.roll(u, 1, 1) - u
        def g(d):
            return jnp.exp(-(d / kappa) ** 2)
        return u + lam * (g(dn) * dn + g(ds) * ds + g(de) * de + g(dw) * dw)
    return jax.lax.fori_loop(0, n_iters, step, frame)


def hist_equalize(frame: Array, n_bins: int = 256) -> Array:
    """Histogram equalization over [0, 255]."""
    flat = frame.reshape(-1)
    hist = jnp.histogram(flat, bins=n_bins, range=(0.0, 255.0))[0]
    cdf = jnp.cumsum(hist).astype(jnp.float32)
    cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1e-12) * 255.0
    idx = jnp.clip((flat / 255.0 * (n_bins - 1)).astype(jnp.int32), 0,
                   n_bins - 1)
    return jnp.take(cdf, idx).reshape(frame.shape)


PREPROC_REGISTRY = {
    "raw": lambda f: f,
    "none": to_gray,
    "gauss": lambda f: gaussian_filter(to_gray(f)),
    "med": lambda f: median_filter(to_gray(f)),
    "box": lambda f: box_filter(to_gray(f)),
    "bil": lambda f: bilateral_filter(to_gray(f)),
    "aniso": lambda f: anisotropic_diffusion(to_gray(f)),
    "sobel": lambda f: sobel_filter(to_gray(f)),
    "hist_eq": lambda f: hist_equalize(to_gray(f)),
    "dft": descriptor_fields,
}


def get_preproc(key: str = "none"):
    """Reference `getPreProc` (pipeline.h:178-247)."""
    k = key.lower()
    if k not in PREPROC_REGISTRY:
        raise ValueError(f"unknown preproc {key!r}; known: "
                         f"{sorted(PREPROC_REGISTRY)}")
    return PREPROC_REGISTRY[k]
