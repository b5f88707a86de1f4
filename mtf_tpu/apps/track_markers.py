"""trackMarkers analog: multi-marker detection + tracking via FeatureTracker.

Reference: `/root/reference/Examples/cpp/trackMarkers.cc` (ReadMe.md:245-247):
given marker template images, locate each marker in the live sequence with
feature matching and keep tracking it; writes per-marker corner files.

Usage:
    python -m mtf_tpu.apps.track_markers --seq frames_dir \
        --markers m1.jpg m2.jpg --out_dir log [--detector orb]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _locate(detector_prm, marker_img, frame, ssm):
    """Find the marker's homography in `frame` by global feature matching."""
    import jax
    import jax.numpy as jnp

    from mtf_tpu.ops import ransac, warp as W
    from mtf_tpu.sm.feature import (FeatureParams, _descr_float, _match,
                                    _make_detector, _to_u8)

    from dataclasses import replace
    det = _make_detector(detector_prm)
    # scene-side detector budget scales with the area ratio, else the
    # global top-N cap can exclude every keypoint inside the target region
    area_ratio = (frame.shape[0] * frame.shape[1]) / max(
        marker_img.shape[0] * marker_img.shape[1], 1)
    det_scene = _make_detector(replace(
        detector_prm, max_keypoints=int(
            detector_prm.max_keypoints * max(1.0, area_ratio))))
    k0, d0 = det.detectAndCompute(_to_u8(marker_img), None)
    k1, d1 = det_scene.detectAndCompute(_to_u8(frame), None)
    if d0 is None or d1 is None or len(k0) < 8 or len(k1) < 8:
        return None
    f0, f1 = _descr_float(d0), _descr_float(d1)
    idx1, ok = _match(jnp.asarray(f0), jnp.asarray(f1),
                      ratio=detector_prm.ratio_thresh)
    ok = np.asarray(ok)
    if ok.sum() < detector_prm.min_matches:
        return None
    p0 = np.asarray([k.pt for k in k0], np.float32)[ok]
    p1 = np.asarray([k.pt for k in k1], np.float32)[np.asarray(idx1)[ok]]
    h, w = marker_img.shape[:2]
    # normalize marker coords to a unit-ish frame for the robust fit
    T = np.array([[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]], np.float32)
    Tinv = np.linalg.inv(T)
    src = W.apply_warp(jnp.asarray(Tinv), jnp.asarray(p0))
    key = jax.random.PRNGKey(0)
    state, _ = ransac.robust_fit(ssm, src, jnp.asarray(p1), key,
                                 n_hyps=256, inlier_thresh=5.0)
    corners_m = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                            jnp.float32)
    return np.asarray(ssm.warp_pts(state, W.apply_warp(jnp.asarray(Tinv),
                                                       corners_m)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seq", required=True)
    p.add_argument("--markers", nargs="+", required=True)
    p.add_argument("--out_dir", default="log")
    p.add_argument("--detector", default="orb")
    p.add_argument("--platform", default="cpu")
    args, extra = p.parse_known_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.sm.feature import FeatureParams
    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils.gt import write_corners_file
    from mtf_tpu.utils.input import get_input, load_image

    markers = [load_image(m) for m in args.markers]
    fprm = FeatureParams(detector=args.detector)
    ssm = get_ssm("8")

    frames = get_input(args.seq)
    trackers, corners_log = {}, {i: [] for i in range(len(markers))}
    for t, frame in enumerate(frames):
        fj = jnp.asarray(np.asarray(frame, np.float32))
        for i, m in enumerate(markers):
            if i not in trackers:
                c = _locate(fprm, m, np.asarray(frame), ssm)
                if c is not None:
                    trk = create_tracker("feat", "ssd", "8",
                                         feat_detector=args.detector)
                    trackers[i] = (trk, trk.initialize(fj, jnp.asarray(c)))
            else:
                trk, st = trackers[i]
                st = trk.update(st, fj)
                trackers[i] = (trk, st)
            if i in trackers:
                corners_log[i].append(
                    np.asarray(trackers[i][0].corners(trackers[i][1])).T)

    os.makedirs(args.out_dir, exist_ok=True)
    for i, cs in corners_log.items():
        if cs:
            name = os.path.splitext(os.path.basename(args.markers[i]))[0]
            write_corners_file(
                os.path.join(args.out_dir, f"marker_{name}.txt"),
                np.stack(cs))
    print(f"tracked {len(trackers)}/{len(markers)} markers; corners in "
          f"{args.out_dir}/marker_*.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
