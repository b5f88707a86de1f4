"""Gradient-histogram (fHOG-style) features as pure XLA tensor ops.

The reference's DSST/KCF bundles use Felzenszwalb HOG ("fHOG", 31
channels) computed by pointer-walking C code
(`/root/reference/ThirdParty/DSST/src/fhog.cpp`,
`ThirdParty/KCF/src/gradientMex.cpp`). That layout — per-pixel snap to
one of 18 orientations, per-cell accumulation, 4-way block-energy
normalization with truncation — is re-derived here as a handful of
reshapes, reductions and elementwise ops: everything maps onto the TPU
VPU with no gathers, and the whole extractor fuses into the surrounding
correlation-filter FFT program.

Differences from fHOG (deliberate, documented):
  * cell accumulation is a plain cell-sum (fHOG bilinearly splats each
    pixel into 4 neighbouring cells); at the 2-4 px cells used by the CF
    trackers this changes features by a few percent and nothing downstream
    assumes otherwise;
  * orientation snap uses the same max-dot-product rule as fHOG.

Output channels (= fHOG's 31): 18 contrast-sensitive + 9 contrast-
insensitive orientation channels, each normalized by the 4 neighbouring
2x2 block energies, truncated at 0.2 and averaged; plus 4 texture-energy
channels (0.2357 * per-block truncated sums).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

N_HOG_CHANNELS = 31


def cell_pool(img: Array, cell: int, reduce: str = "mean") -> Array:
    """(H, W[, C]) -> (H/cell, W/cell[, C]) by cell-wise mean/sum."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    hc, wc = h // cell, w // cell
    v = img[: hc * cell, : wc * cell].reshape(hc, cell, wc, cell, c)
    v = v.sum(axis=(1, 3)) if reduce == "sum" else v.mean(axis=(1, 3))
    return v[..., 0] if squeeze else v


def _grad(img: Array):
    """Central-difference gradients with replicate edges -> (gx, gy)."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


def hog(patch: Array, n_orient: int = 9, cell: int = 4,
        eps: float = 1e-4, clip: float = 0.2) -> Array:
    """fHOG-style features of a grayscale patch.

    patch: (H, W) float; returns (H//cell, W//cell, 31) for n_orient=9.
    """
    if patch.ndim == 3:
        patch = jnp.mean(patch, axis=-1)
    gx, gy = _grad(patch)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)

    # snap each pixel to one of 2n signed orientations by max dot product
    # (fhog.cpp's acos-table lookup == argmax over unit directions)
    n2 = 2 * n_orient
    theta = jnp.pi * (jnp.arange(n2, dtype=patch.dtype) / n_orient)
    proj = (gx[..., None] * jnp.cos(theta)
            + gy[..., None] * jnp.sin(theta))            # (H, W, 2n)
    onehot = jax.nn.one_hot(jnp.argmax(proj, axis=-1), n2,
                            dtype=patch.dtype)
    votes = mag[..., None] * onehot                      # (H, W, 2n)

    hist = cell_pool(votes, cell, reduce="sum")          # (Hc, Wc, 2n)
    u = hist[..., :n_orient] + hist[..., n_orient:]      # insensitive (n,)

    # 4 neighbouring 2x2 block energies per cell (replicate at borders)
    e = jnp.sum(u * u, axis=-1)                          # (Hc, Wc)
    ep = jnp.pad(e, ((1, 1), (1, 1)), mode="edge")
    c0 = ep[1:-1, 1:-1]
    n_, s_ = ep[:-2, 1:-1], ep[2:, 1:-1]
    w_, e_ = ep[1:-1, :-2], ep[1:-1, 2:]
    nw, ne = ep[:-2, :-2], ep[:-2, 2:]
    sw, se = ep[2:, :-2], ep[2:, 2:]
    blocks = jnp.stack([c0 + n_ + w_ + nw, c0 + n_ + e_ + ne,
                        c0 + s_ + w_ + sw, c0 + s_ + e_ + se])  # (4,Hc,Wc)
    inv = jax.lax.rsqrt(blocks + eps)[..., None]         # (4, Hc, Wc, 1)

    v27 = jnp.concatenate([hist, u], axis=-1)            # (Hc, Wc, 3n)
    h4 = jnp.minimum(v27[None] * inv, clip)              # (4, Hc, Wc, 3n)
    feat = 0.5 * jnp.sum(h4, axis=0)                     # (Hc, Wc, 3n)
    texture = 0.2357 * jnp.sum(
        jnp.minimum(hist[None] * inv, clip), axis=-1)    # (4, Hc, Wc)
    return jnp.concatenate(
        [feat, jnp.moveaxis(texture, 0, -1)], axis=-1)   # (Hc, Wc, 3n+4)
