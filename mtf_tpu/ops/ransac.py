"""Robust warp estimation: RANSAC / LMedS / least-squares.

TPU-native re-design of the reference SSMEstimator
(`/root/reference/SSM/src/SSMEstimator.cc:73-200`: serial hypothesis loop
with adaptive iteration counts): rephrased as a *fixed-size batch* of
minimal-sample hypotheses fitted and scored in parallel via vmap —
deterministic shapes, jit/vmap-friendly, and the natural form for sharding
hypotheses across a mesh. A weighted least-squares refit on the best
hypothesis's inlier set replaces iterative refinement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def min_sample_size(ssm) -> int:
    """Minimal correspondences to determine the warp (2 constraints/point)."""
    return max(1, (ssm.dof + 1) // 2)


def hyp_indices(key: Array, n_hyps: int, n_pts: int,
                sample_size: int) -> Array:
    """The (H, sample_size) minimal-sample index draw. Shared by the
    single-chip and hypothesis-sharded fits so both score the SAME
    hypothesis set for the same key."""
    return jax.random.randint(key, (n_hyps, sample_size), 0, n_pts)


def _hypotheses(ssm, src, dst, key, n_hyps, sample_size):
    idx = hyp_indices(key, n_hyps, src.shape[0], sample_size)
    return jax.vmap(lambda i: ssm.fit_pts(src[i], dst[i]))(idx)  # (H, S)


def _residuals(ssm, states, src, dst):
    return jax.vmap(
        lambda s: jnp.linalg.norm(ssm.warp_pts(s, src) - dst, axis=-1)
    )(states)  # (H, N)


def ransac_fit(ssm, src: Array, dst: Array, key: Array,
               n_hyps: int = 64, inlier_thresh: float = 0.05,
               weights: Array | None = None):
    """RANSAC warp fit (SSMEstimator.cc:73-130 analog).

    src/dst: (N, 2) correspondences (same frame as the SSM operates in —
    normalized template coords in this codebase, so `inlier_thresh` is in
    normalized units). Returns (state, inlier_weights (N,)).
    """
    ss = min_sample_size(ssm)
    hyps = _hypotheses(ssm, src, dst, key, n_hyps, ss)
    res = _residuals(ssm, hyps, src, dst)
    valid = jnp.all(jnp.isfinite(hyps), axis=-1)
    inl = (res < inlier_thresh).astype(src.dtype)
    if weights is not None:
        inl = inl * weights[None, :]
    scores = jnp.where(valid, jnp.sum(inl, axis=1), -1.0)
    best = jnp.argmax(scores)
    w = inl[best]
    # guard: if everything is an outlier fall back to unweighted LS
    w = jnp.where(jnp.sum(w) >= ss, w, jnp.ones_like(w))
    return ssm.fit_pts(src, dst, weights=w), w


def lmeds_fit(ssm, src: Array, dst: Array, key: Array,
              n_hyps: int = 64, weights: Array | None = None):
    """Least-median-of-squares fit (SSMEstimator.cc:186 analog):
    hypothesis minimizing the median squared residual, then a refit on
    points within 2.5 * robust sigma."""
    ss = min_sample_size(ssm)
    hyps = _hypotheses(ssm, src, dst, key, n_hyps, ss)
    res = _residuals(ssm, hyps, src, dst)
    med = jnp.median(res * res, axis=1)
    valid = jnp.all(jnp.isfinite(hyps), axis=-1)
    med = jnp.where(valid, med, jnp.inf)
    best = jnp.argmin(med)
    sigma = 1.4826 * jnp.sqrt(med[best]) + 1e-12
    w = (res[best] < 2.5 * sigma).astype(src.dtype)
    if weights is not None:
        w = w * weights
    w = jnp.where(jnp.sum(w) >= ss, w, jnp.ones_like(w))
    return ssm.fit_pts(src, dst, weights=w), w


def robust_fit(ssm, src, dst, key, method: str = "ransac",
               n_hyps: int = 64, inlier_thresh: float = 0.05,
               weights: Array | None = None):
    """Dispatch over EstType {RANSAC, LeastMedian, LeastSquares}
    (SSMEstimatorParams.h:11)."""
    if method == "ransac":
        return ransac_fit(ssm, src, dst, key, n_hyps, inlier_thresh, weights)
    if method in ("lmeds", "least_median"):
        return lmeds_fit(ssm, src, dst, key, n_hyps, weights)
    if method in ("median", "medianflow"):
        return median_flow_fit(ssm, src, dst, weights)
    w = weights if weights is not None else jnp.ones(src.shape[0], src.dtype)
    return ssm.fit_pts(src, dst, weights=w), w


def median_flow_fit(ssm, src, dst, weights: Array | None = None):
    """Median-Flow similarity estimate (Kalal et al., ICPR'10 — the
    tracker core of the reference's bundled TLD, `ThirdParty/TLD`):
    scale = median over point pairs of ||dst_i-dst_j|| / ||src_i-src_j||,
    translation = median of (dst - scale * src) per axis. `weights` (the
    forward-backward mask) excludes unreliable points from both medians
    via NaN-median. Returns (ssm_state fit on the similarity-transformed
    corners, weights-as-inliers)."""
    n = src.shape[0]
    w = weights if weights is not None else jnp.ones((n,), src.dtype)
    ok = w > 0.5
    pair_ok = ok[:, None] & ok[None, :] & ~jnp.eye(n, dtype=bool)
    d_src = jnp.linalg.norm(src[:, None, :] - src[None, :, :], axis=-1)
    d_dst = jnp.linalg.norm(dst[:, None, :] - dst[None, :, :], axis=-1)
    ratio = jnp.where(pair_ok, d_dst / jnp.maximum(d_src, 1e-8), jnp.nan)
    s = jnp.nan_to_num(jnp.nanmedian(ratio), nan=1.0)
    t = dst - s * src
    tx = jnp.nan_to_num(jnp.nanmedian(jnp.where(ok, t[:, 0], jnp.nan)))
    ty = jnp.nan_to_num(jnp.nanmedian(jnp.where(ok, t[:, 1], jnp.nan)))
    trans = jnp.stack([tx, ty])
    state = ssm.fit_pts(src, s * src + trans[None, :])
    return state, w
