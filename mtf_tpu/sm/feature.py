"""FeatureTracker: sparse detector/descriptor matching + robust warp fit.

Re-designs `/root/reference/SM/src/FeatureTracker.cc` (1261 LoC): detect
keypoints in a search window around the current region, match descriptors
against the template set, and robustly fit the SSM to the matched point
pairs (detect -> compute -> matchKeyPoints -> cmptWarpedCorners). Drives
the `trackMarkers` app.

TPU-native split: detection/description run host-side (OpenCV detectors,
same families as the reference registry `mtf.h:672-744` — ORB/BRISK/SIFT/
AKAZE...); the quadratic work — the full descriptor distance matrix,
ratio test, and RANSAC hypothesis scoring — is batched device math
(binary descriptors become {0,1} vectors so Hamming distance is one
matmul: |a| + |b| - 2 a.b).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.ops import ransac
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, SMParams, TrackerState, make_region

Array = jax.Array


@dataclass(frozen=True)
class FeatureParams:
    """feat_* parameter block analog (FeatureTrackerParams)."""
    detector: str = "orb"          # orb | brisk | sift | akaze | fast
    max_keypoints: int = 500
    ratio_thresh: float = 0.75     # Lowe ratio test
    max_dist_ratio: float = 1.0
    search_margin: float = 1.5     # search window = region scaled by this
    min_matches: int = 8
    estimator: str = "ransac"      # ransac | lmeds | lsq
    inlier_thresh: float = 0.05    # in normalized template units
    n_hypotheses: int = 128
    seed: int = 0


def _make_detector(prm: FeatureParams):
    import cv2
    k = prm.detector.lower()
    if k == "orb":
        return cv2.ORB_create(nfeatures=prm.max_keypoints)
    if k == "brisk":
        return cv2.BRISK_create()
    if k == "sift":
        return cv2.SIFT_create(nfeatures=prm.max_keypoints)
    if k == "akaze":
        return cv2.AKAZE_create()
    raise ValueError(f"unknown detector {prm.detector!r}")


def _to_u8(frame) -> np.ndarray:
    a = np.asarray(frame)
    if a.ndim == 3:
        a = a.mean(axis=-1)
    return np.clip(a, 0, 255).astype(np.uint8)


def _descr_float(desc: np.ndarray) -> np.ndarray:
    """Binary descriptors -> {0,1} float matrix (Hamming by matmul);
    float descriptors pass through L2-normalized."""
    if desc.dtype == np.uint8:
        return np.unpackbits(desc, axis=1).astype(np.float32)
    d = desc.astype(np.float32)
    return d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)


@jax.jit
def _match(d0: Array, d1: Array, ratio: float = 0.75):
    """Mutual-best match with ratio test on the full distance matrix.

    d0 (K0, D) template, d1 (K1, D) current, {0,1} or unit float rows.
    dist^2 = |a|^2 + |b|^2 - 2ab  (== Hamming for binary {0,1} rows).
    Returns (idx1 for each template kp, valid mask).
    """
    n0 = jnp.sum(d0 * d0, axis=1)[:, None]
    n1 = jnp.sum(d1 * d1, axis=1)[None, :]
    dist = n0 + n1 - 2.0 * jnp.dot(d0, d1.T,
                                   preferred_element_type=jnp.float32)
    best1 = jnp.argmin(dist, axis=1)                       # (K0,)
    dbest = jnp.min(dist, axis=1)
    # second best for ratio test
    masked = dist.at[jnp.arange(dist.shape[0]), best1].set(jnp.inf)
    dsecond = jnp.min(masked, axis=1)
    # mutual check
    best0 = jnp.argmin(dist, axis=0)                       # (K1,)
    mutual = best0[best1] == jnp.arange(dist.shape[0])
    ok = jnp.logical_and(mutual, dbest < (ratio ** 2) * dsecond)
    return best1, ok


class FeatureState:
    """Host-side extra state (keypoints/descriptors are variable-size)."""

    def __init__(self, desc0, pts0_t):
        self.desc0 = desc0          # (K0, D) float
        self.pts0_t = pts0_t        # (K0, 2) template-frame coords


class FeatureTracker(SearchMethod):
    """TrackerBase-compatible sparse feature tracker ('feat' key)."""

    name = "feat"

    def __init__(self, ssm, prm: SMParams | None = None,
                 feat: FeatureParams | None = None):
        # AM-less (reference SearchMethod<void, SSM> specialization,
        # SM/SearchMethod.h:84)
        from mtf_tpu.am import get_am
        super().__init__(get_am("ssd"), ssm, prm)
        self.feat = feat or FeatureParams()
        self._detector = _make_detector(self.feat)
        self._key = jax.random.PRNGKey(self.feat.seed)

    def _detect(self, frame, region_corners: np.ndarray | None):
        img = _to_u8(frame)
        mask = None
        if region_corners is not None:
            import cv2
            mask = np.zeros(img.shape, np.uint8)
            c = np.mean(region_corners, axis=0)
            grown = c + self.feat.search_margin * (region_corners - c)
            cv2.fillConvexPoly(mask, grown.astype(np.int32), 255)
        kps, desc = self._detector.detectAndCompute(img, mask)
        if desc is None or len(kps) == 0:
            return np.zeros((0, 2), np.float32), None
        pts = np.asarray([k.pt for k in kps], np.float32)
        return pts, _descr_float(desc)

    def initialize(self, frame, corners_img) -> TrackerState:
        state = super().initialize(frame, corners_img)
        c_img = np.asarray(corners_img, np.float32)
        pts, desc = self._detect(frame, c_img)
        if desc is None:
            raise ValueError("no features detected in init region")
        # keep only keypoints inside the region; store in template frame
        Tinv = np.asarray(jnp.linalg.inv(state.region.norm_mat))
        pts_t = W.apply_warp(jnp.asarray(Tinv), jnp.asarray(pts))
        bc = np.asarray(state.region.base_corners)
        lo, hi = bc.min(0) - 1e-3, bc.max(0) + 1e-3
        inside = np.logical_and(
            (np.asarray(pts_t) >= lo).all(-1),
            (np.asarray(pts_t) <= hi).all(-1))
        if inside.sum() < self.feat.min_matches:
            inside[:] = True  # fall back to the whole window
        fs = FeatureState(jnp.asarray(desc[inside]),
                          jnp.asarray(np.asarray(pts_t)[inside]))
        return state._replace(extra=fs)

    def _update(self, state: TrackerState, frame) -> TrackerState:
        fs: FeatureState = state.extra
        cur_corners = np.asarray(self.corners(state)).T  # (4,2) image
        pts, desc = self._detect(frame, cur_corners)
        if desc is None or len(pts) < self.feat.min_matches:
            return state  # hold last state (reference failure behavior)

        idx1, ok = _match(fs.desc0, jnp.asarray(desc),
                          self.feat.ratio_thresh)
        ok_np = np.asarray(ok)
        if ok_np.sum() < self.feat.min_matches:
            return state

        Tinv = jnp.linalg.inv(state.region.norm_mat)
        dst_t = W.apply_warp(Tinv, jnp.asarray(pts)[idx1])  # (K0, 2)
        src = fs.pts0_t[ok]
        dst = dst_t[ok]

        if self.feat.estimator == "lsq" or src.shape[0] < 2 * \
                ransac.min_sample_size(self.ssm):
            new_state = self.ssm.fit_pts(src, dst)
        else:
            self._key, k = jax.random.split(self._key)
            new_state, _ = ransac.robust_fit(
                self.ssm, src, dst, k, method=self.feat.estimator,
                inlier_thresh=self.feat.inlier_thresh,
                n_hyps=self.feat.n_hypotheses)
        return state._replace(ssm_state=new_state)
