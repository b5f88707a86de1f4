"""CMT (Consensus-based Matching and Tracking, Nebehay & Pflugfelder
CVPR'15) — TPU-native.

The reference bundles CMT as ThirdParty C++
(`/root/reference/ThirdParty/CMT/CMT.cpp`, 4.2 kLoC with Matcher /
Consensus / Tracker helpers). Architecture kept: a database of target
keypoints with positions relative to the object center is (a) tracked
frame-to-frame with pyramidal LK + forward-backward validation and (b)
re-matched globally against fresh detections; scale and rotation come
from MEDIAN votes over all keypoint pairs, each keypoint then votes for
the object center, and the consensus cluster of votes localizes the
target — which survives deformation and partial occlusion because every
surviving keypoint votes independently.

TPU mapping (vs the reference's per-point loops and OpenCV calls):
- fixed-capacity keypoint set (K slots + validity mask) — the pairwise
  scale/rotation estimates are (K, K) masked tensors and their medians
  are masked sorts, `Consensus::estimateScaleRotation` as two reductions;
- the center votes + the reference's hierarchical-clustering consensus
  (`Consensus::findConsensus`) become an iterated vector median: medoid
  vote -> inliers within the cluster radius -> refined mean (same
  behavior for a unimodal cluster, fixed shape, no host clustering);
- frame-to-frame keypoint tracking is one vmapped 2-DOF Lucas-Kanade
  over all K patches with forward-backward error gating
  (`Tracker::track`), sampling through `ops/interp` — no cv2 pyrLK;
- descriptor matching reuses the FeatureTracker machinery: binary
  descriptors as {0,1} vectors, Hamming distance = one matmul, ratio
  test against the background set (`Matcher::matchGlobal`).

Like the reference (and FeatureTracker), keypoint DETECTION runs
host-side per frame; `update_with_detections(state, pts, desc, valid)`
is the pure device stage.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.sm.cf import _center_size_of
from mtf_tpu.sm.feature import _descr_float, _make_detector, \
    _make_descriptor, _to_u8

Array = jax.Array


@dataclass(frozen=True)
class CMTParams:
    """CMT.cpp defaults: BRISK keypoints, thr_ratio 0.8, 20-px consensus
    cluster cutoff, forward-backward error gate."""
    detector: str = "orb"
    max_keypoints: int = 128   # foreground keypoint slots (K)
    max_bg: int = 256          # background descriptor slots
    ratio_thresh: float = 0.8
    match_thresh: float = 0.25  # max normalized descriptor distance
    fb_err: float = 2.0        # forward-backward gate (px)
    lk_res: int = 9            # LK patch size per keypoint
    lk_iters: int = 12
    lk_levels: int = 2
    consensus_radius: float = 20.0  # vote cluster radius (thr_outlier)
    min_votes: int = 4
    seed: int = 0


class CMTState(NamedTuple):
    center: Array       # (2,)
    scale: Array        # ()
    rot: Array          # () radians
    base_sz: Array      # (2,) init bbox size
    kp_rel: Array       # (K, 2) init positions relative to center
    kp_desc: Array      # (K, D) foreground descriptors ({0,1} floats)
    kp_valid: Array     # (K,)
    bg_desc: Array      # (KB, D) background descriptors
    bg_valid: Array     # (KB,)
    active_pos: Array   # (K, 2) current tracked keypoint positions
    active_ok: Array    # (K,) tracked-this-frame flag
    prev_frame: Array   # (H, W) previous gray frame (f2f LK leg)


class CMT:
    name = "cmt"
    ssm = None  # similarity-bbox tracker (center + scale + rotation)
    jittable = False  # cv2 keypoint detection runs host-side in update

    def __init__(self, prm: CMTParams | None = None):
        self.prm = prm or CMTParams()

    # -- host-side detection (reference uses BRISK detect/compute) ----
    def _detect(self, frame):
        p = self.prm
        import cv2  # noqa: F401
        det = _make_detector(p.detector, p.max_keypoints + p.max_bg)
        des = _make_descriptor(p.detector, p.max_keypoints + p.max_bg)
        img = _to_u8(frame)
        kps = det.detect(img, None)
        kps, desc = des.compute(img, kps)
        if not kps:
            return np.zeros((0, 2), np.float32), np.zeros((0, 1),
                                                          np.float32)
        pts = np.asarray([k.pt for k in kps], np.float32)
        return pts, _descr_float(desc)

    @staticmethod
    def _pad(a, n, d=None):
        d = a.shape[1] if d is None else d
        out = np.zeros((n, d), np.float32)
        k = min(len(a), n)
        if k:
            out[:k] = a[:k, :d]
        valid = np.zeros((n,), np.float32)
        valid[:k] = 1.0
        return jnp.asarray(out), jnp.asarray(valid)

    # -- vmapped per-keypoint pyramidal LK (Tracker::track analog) ----
    def _lk_points(self, prev, curr, pts, valid):
        """Track (K, 2) points prev->curr; returns (new_pts, ok) with a
        forward-backward error gate. Coarse pyramid levels sample
        binomially BLURRED images (a strided sample of the raw image
        aliases past thin gradient structure — edge-only textures then
        under-converge while still passing the symmetric FB check)."""
        from mtf_tpu.sm.lk import LKBase
        p = self.prm
        r = p.lk_res // 2
        dg = jnp.arange(-r, r + 1, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(dg, dg, indexing="ij")
        offs = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (P, 2)
        scales = [2 ** lvl for lvl in range(p.lk_levels - 1, -1, -1)]
        prev_l = {s: (LKBase._blur2(prev, s) if s > 1 else prev)
                  for s in scales}
        curr_l = {s: (LKBase._blur2(curr, s) if s > 1 else curr)
                  for s in scales}

        def track_one(imgs0, imgs1, pt):
            def level(pt_shift, s):
                t = interp.sample(imgs0[s], pt[None] * 1.0 + offs * s,
                                  "linear")[:, 0]

                def body(shift, _):
                    q = pt[None] + shift[None] + offs * s
                    v = interp.sample(imgs1[s], q, "linear")[:, 0]
                    g = interp.sample_grad(imgs1[s], q,
                                           "linear")[:, 0]      # (P, 2)
                    rvec = v - t
                    H = g.T @ g + 1e-4 * jnp.eye(2)
                    dp = jnp.linalg.solve(H, g.T @ rvec)
                    return shift - dp, None

                shift, _ = jax.lax.scan(body, pt_shift, None,
                                        length=p.lk_iters)
                return shift

            shift = jnp.zeros((2,), jnp.float32)
            for s in scales:
                shift = level(shift, float(s))
            return pt + shift

        fwd = jax.vmap(lambda pt: track_one(prev_l, curr_l, pt))(pts)
        bwd = jax.vmap(lambda pt: track_one(curr_l, prev_l, pt))(fwd)
        fb = jnp.linalg.norm(bwd - pts, axis=-1)
        ok = (fb < p.fb_err) & (valid > 0.5)
        return fwd, ok

    # -- device matching (Matcher::matchGlobal analog) ----------------
    def _match(self, state: CMTState, pts, desc, dvalid):
        """Match fresh detections to the foreground database with a
        ratio test against BOTH the second-best foreground and the best
        background descriptor. Returns per-database-slot (pos, ok)."""
        p = self.prm

        def dist(a, b):
            # binary descriptors as {0,1}: Hamming = |a|+|b|-2ab, then
            # normalized by dimension
            d = (jnp.sum(a, -1)[:, None] + jnp.sum(b, -1)[None, :]
                 - 2.0 * a @ b.T)
            return d / a.shape[-1]

        dfg = dist(desc, state.kp_desc)                     # (N, K)
        dfg = jnp.where((dvalid[:, None] > 0.5)
                        & (state.kp_valid[None, :] > 0.5), dfg, 1e3)
        dbg = dist(desc, state.bg_desc)
        dbg = jnp.where((dvalid[:, None] > 0.5)
                        & (state.bg_valid[None, :] > 0.5), dbg, 1e3)
        best_bg = jnp.min(dbg, axis=1)                      # (N,)
        # per database slot: best detection
        j = jnp.argmin(dfg, axis=0)                         # (K,)
        dbest = jnp.min(dfg, axis=0)
        # second-best over the same column
        dfg2 = dfg.at[j, jnp.arange(dfg.shape[1])].set(1e3)
        dsecond = jnp.min(jnp.minimum(dfg2, best_bg[:, None]), axis=0)
        ok = ((dbest < p.match_thresh)
              & (dbest < p.ratio_thresh * dsecond)
              & (state.kp_valid > 0.5))
        return pts[j], ok

    # -- consensus (Consensus::estimateScaleRotation/findConsensus) ---
    @staticmethod
    def _masked_median(x, mask):
        big = jnp.max(jnp.abs(x)) + 1.0
        xs = jnp.sort(jnp.where(mask, x, big))
        n = jnp.sum(mask.astype(jnp.int32))
        mid = jnp.maximum(n - 1, 0) // 2
        return xs[mid]

    def _consensus(self, pos, ok, rel):
        """(center, scale, rot, inlier mask) from keypoint votes."""
        p = self.prm
        K = pos.shape[0]
        pair = ok[:, None] & ok[None, :] & \
            (jnp.arange(K)[:, None] < jnp.arange(K)[None, :])
        dp = pos[:, None, :] - pos[None, :, :]
        dr = rel[:, None, :] - rel[None, :, :]
        ndp = jnp.linalg.norm(dp, axis=-1)
        ndr = jnp.linalg.norm(dr, axis=-1)
        pair = pair & (ndr > 1e-3)
        s = self._masked_median((ndp / jnp.maximum(ndr, 1e-6)).ravel(),
                                pair.ravel())
        # rotation: angle difference per pair; robust mean via the unit-
        # vector sum of 2*theta? CMT uses the median of wrapped diffs —
        # the resultant-vector mean is the smooth equivalent
        ang = jnp.arctan2(dp[..., 1], dp[..., 0]) \
            - jnp.arctan2(dr[..., 1], dr[..., 0])
        w = pair.astype(jnp.float32)
        rot = jnp.arctan2(jnp.sum(jnp.sin(ang) * w),
                          jnp.maximum(jnp.sum(jnp.cos(ang) * w), 1e-6)
                          * jnp.sign(jnp.sum(jnp.cos(ang) * w) + 1e-9))
        rot = jnp.arctan2(jnp.sum(jnp.sin(ang) * w) + 1e-12,
                          jnp.sum(jnp.cos(ang) * w) + 1e-12)
        c, si = jnp.cos(rot), jnp.sin(rot)
        R = jnp.asarray([[c, -si], [si, c]])
        votes = pos - s * (rel @ R.T)                       # (K, 2)
        # iterated medoid consensus: start from the per-axis masked
        # median, keep votes within the cluster radius, refine by mean
        cx = self._masked_median(votes[:, 0], ok)
        cy = self._masked_median(votes[:, 1], ok)
        center = jnp.stack([cx, cy])
        for _ in range(2):
            d = jnp.linalg.norm(votes - center, axis=-1)
            inl = ok & (d < p.consensus_radius)
            wsum = jnp.maximum(jnp.sum(inl.astype(jnp.float32)), 1.0)
            center = jnp.sum(jnp.where(inl[:, None], votes, 0.0),
                             axis=0) / wsum
        d = jnp.linalg.norm(votes - center, axis=-1)
        inl = ok & (d < p.consensus_radius)
        return center, s, rot, inl

    # -- TrackerBase contract -----------------------------------------
    def initialize(self, frame, corners_img) -> CMTState:
        p = self.prm
        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = jnp.mean(frame, axis=-1)
        corners_img = np.asarray(corners_img, np.float32)
        if corners_img.shape[0] == 2:
            corners_img = corners_img.T
        center, size = _center_size_of(jnp.asarray(corners_img))
        c_np = np.asarray(center)
        s_np = np.asarray(size)
        pts, desc = self._detect(np.asarray(frame))
        if len(pts) == 0:
            pts = c_np[None, :]
            desc = np.zeros((1, 8), np.float32)
        inside = (np.abs(pts - c_np) <= s_np / 2).all(axis=1)
        fg_pts, fg_desc = pts[inside], desc[inside]
        bg_desc = desc[~inside]
        K, KB = p.max_keypoints, p.max_bg
        D = desc.shape[1]
        fg_p, fg_v = self._pad(fg_pts, K, 2)
        fg_d, _ = self._pad(fg_desc, K, D)
        bg_d, bg_v = self._pad(bg_desc, KB, D)
        return CMTState(
            center=jnp.asarray(center), scale=jnp.asarray(1.0, jnp.float32),
            rot=jnp.asarray(0.0, jnp.float32), base_sz=jnp.asarray(size),
            kp_rel=fg_p - jnp.asarray(center)[None, :],
            kp_desc=fg_d, kp_valid=fg_v,
            bg_desc=bg_d, bg_valid=bg_v,
            active_pos=fg_p, active_ok=fg_v > 0.5,
            prev_frame=frame)

    def update_with_detections(self, state: CMTState, pts: Array,
                               desc: Array, dvalid: Array,
                               frame: Array) -> CMTState:
        """Pure device stage: LK-track + match + consensus + fuse."""
        # 1. frame-to-frame LK on the active keypoints
        trk_pos, trk_ok = self._lk_points(state.prev_frame, frame,
                                          state.active_pos,
                                          state.active_ok.astype(
                                              jnp.float32))
        # 2. global matching of fresh detections
        m_pos, m_ok = self._match(state, pts, desc, dvalid)
        # 3. fuse: tracked position wins, matches revive lost keypoints
        pos = jnp.where(trk_ok[:, None], trk_pos, m_pos)
        ok = trk_ok | m_ok
        # 4. scale/rotation + center consensus
        center, s, rot, inl = self._consensus(pos, ok, state.kp_rel)
        enough = jnp.sum(inl.astype(jnp.int32)) >= self.prm.min_votes
        center = jnp.where(enough, center, state.center)
        s = jnp.where(enough, s, state.scale)
        rot = jnp.where(enough, rot, state.rot)
        # 5. survivors stay active; lost keypoints re-seed at their
        # expected positions (so LK can pick them back up)
        c2, si2 = jnp.cos(rot), jnp.sin(rot)
        R = jnp.asarray([[c2, -si2], [si2, c2]])
        expected = center[None, :] + s * (state.kp_rel @ R.T)
        new_pos = jnp.where(inl[:, None], pos, expected)
        return state._replace(center=center, scale=s, rot=rot,
                              active_pos=new_pos,
                              active_ok=inl | (state.kp_valid > 0.5),
                              prev_frame=frame)

    def update(self, state: CMTState, frame) -> CMTState:
        p = self.prm
        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = jnp.mean(frame, axis=-1)
        pts, desc = self._detect(np.asarray(frame))
        N = p.max_keypoints + p.max_bg
        D = state.kp_desc.shape[1]
        pt_p, pt_v = self._pad(pts, N, 2)
        de_p, _ = self._pad(desc, N, D)
        return self.update_with_detections(state, pt_p, de_p, pt_v, frame)

    def corners(self, st: CMTState) -> Array:
        """(2, 4) corners of the scaled/rotated init box."""
        w, h = st.base_sz[0] / 2, st.base_sz[1] / 2
        base = jnp.asarray([[-w, -h], [w, -h], [w, h], [-w, h]])
        c, s = jnp.cos(st.rot), jnp.sin(st.rot)
        R = jnp.asarray([[c, -s], [s, c]])
        return (st.center[None, :] + st.scale * (base @ R.T)).T

    def set_region(self, st: CMTState, corners_img, frame=None) -> CMTState:
        corners_img = jnp.asarray(corners_img, jnp.float32)
        if corners_img.shape[0] == 2:
            corners_img = corners_img.T
        center, size = _center_size_of(corners_img)
        scale = jnp.mean(size / jnp.maximum(st.base_sz, 1e-6))
        return st._replace(center=center, scale=scale)

    def reinitialize(self, frame, corners_img) -> CMTState:
        return self.initialize(frame, corners_img)
