"""Synthetic warped-sequence generation with exact ground truth.

TPU-native analog of the reference `generateSyntheticSeq`
(`/root/reference/Examples/cpp/generateSyntheticSeq.cc:86-160`,
`imgUtils.h:740-752` generateWarpedImg): render frames by warping a seed
image with a sampled SSM trajectory (+ optional illumination change and
Gaussian noise), producing exact corner GT — the basis of known-warp
recovery integration tests (SURVEY.md §4.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W

Array = jax.Array


def full_grid(h: int, w: int, dtype=jnp.float32) -> Array:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (H*W, 2)


def warp_image(img: Array, warp_mat: Array, kind: str = interp.CUBIC) -> Array:
    """Render I'(x) = I(W^-1 x): the scene moves by `warp_mat`."""
    img3 = img[..., None] if img.ndim == 2 else img
    h, w, c = img3.shape
    pts = W.apply_warp(jnp.linalg.inv(warp_mat), full_grid(h, w, img3.dtype))
    out = interp.sample(img3, pts, kind).reshape(h, w, c)
    return out[..., 0] if img.ndim == 2 else out


def synthetic_sequence(img: Array, corners0: Array, ssm, n_frames: int,
                       sigma_scale: float = 0.02, seed: int = 0,
                       noise_sigma: float = 0.0,
                       gain_drift: float = 0.0, bias_drift: float = 0.0):
    """Random-walk warp trajectory rendered as a frame sequence.

    corners0: (4, 2) initial region — or (M, 4, 2) for M objects riding
    the same global scene warp (multi-object GT comes for free since the
    warp is scene-wide); the per-frame warp is a compositional random
    walk of `ssm` states in a normalized frame anchored at the region(s)
    (so sigma_scale is resolution-independent).

    Returns (frames (T, H, W[, C]) float32,
             gt_corners (T, 4, 2) or (T, M, 4, 2) matching corners0).
    """
    rng = np.random.default_rng(seed)
    flat = np.asarray(corners0).reshape(-1, 2)
    c = np.mean(flat, axis=0)
    scale = float(np.mean(np.linalg.norm(flat - c, axis=-1)))
    T = np.array([[scale, 0.0, c[0]], [0.0, scale, c[1]], [0.0, 0.0, 1.0]],
                 np.float32)
    Tinv = np.linalg.inv(T)

    state = np.zeros(ssm.dof, np.float32)
    frames, gt = [], []
    for t in range(n_frames):
        Wmat_t = np.asarray(ssm.to_matrix(jnp.asarray(state)))
        Wimg = T @ Wmat_t @ Tinv  # warp in image coords
        frame = warp_image(img, jnp.asarray(Wimg, jnp.float32))
        if gain_drift or bias_drift:
            frame = frame * (1.0 + gain_drift * t) + bias_drift * t
        if noise_sigma > 0:
            frame = frame + jnp.asarray(
                rng.normal(0, noise_sigma, frame.shape), jnp.float32)
        frames.append(frame)
        gt.append(np.asarray(W.apply_warp(jnp.asarray(Wimg, jnp.float32),
                                          corners0)))
        dp = rng.normal(0, sigma_scale, ssm.dof).astype(np.float32)
        state = np.asarray(ssm.compositional_update(
            jnp.asarray(state), jnp.asarray(dp)))
    return jnp.stack(frames), np.stack(gt)


def mean_corner_distance(c1, c2) -> float:
    """MCD tracking error (reference TrackErrT::MCD, miscUtils.h:449-466)."""
    return float(np.mean(np.linalg.norm(np.asarray(c1) - np.asarray(c2),
                                        axis=-1)))
