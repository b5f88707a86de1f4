"""Gaussian image pyramids (for PyramidalSM — reference
`SM/src/PyramidalSM.cc`/`PyramidalTracker.cc`, mtf.h:554-587).

Binomial 5-tap blur + stride-2 subsampling via depthwise lax.conv —
static shapes per level, fully jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_KERNEL_1D = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def gaussian_downsample(img: Array) -> Array:
    """(H, W[, C]) -> (ceil(H/2), ceil(W/2)[, C]) with binomial blur."""
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, c = x.shape
    x = jnp.moveaxis(x, -1, 0)[None]  # (1, C, H, W)
    k = (_KERNEL_1D[:, None] * _KERNEL_1D[None, :]).astype(x.dtype)
    kern = jnp.zeros((c, 1, 5, 5), x.dtype) + k[None, None]
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding=[(2, 2), (2, 2)],
        feature_group_count=c)
    y = jnp.moveaxis(y[0], 0, -1)
    return y[..., 0] if squeeze else y


def build_pyramid(img: Array, n_levels: int) -> list:
    """[level0 (full res), level1 (half), ...]."""
    out = [img]
    for _ in range(n_levels - 1):
        out.append(gaussian_downsample(out[-1]))
    return out
