"""trackUAVTrajectory analog: localize a UAV image stream in a map.

Reference: `/root/reference/Examples/cpp/trackUAVTrajectory.cc`
(ReadMe.md:243): each UAV camera frame is registered against a large
satellite/aerial map; the per-frame warp's center traces the UAV
trajectory.

Pipeline: feature-match the first frame into the map (global
localization), then track the map region with a template SM per frame,
re-localizing by features if the tracker diverges. Writes the trajectory
as `frame x y` rows plus the per-frame corner file.

Usage:
    python -m mtf_tpu.apps.track_uav_trajectory --map map.jpg \
        --seq uav_frames/ --out_dir log [sm esm am ncc ssm 8]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", required=True, dest="map_img")
    p.add_argument("--seq", required=True)
    p.add_argument("--out_dir", default="log")
    p.add_argument("--detector", default="orb")
    p.add_argument("--reloc_err", type=float, default=30.0,
                   help="corner-jump threshold triggering re-localization")
    p.add_argument("--platform", default="cpu")
    args, extra = p.parse_known_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.apps.track_markers import _locate
    from mtf_tpu.sm.feature import FeatureParams
    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils.config import read_params
    from mtf_tpu.utils.gt import write_corners_file
    from mtf_tpu.utils.input import get_input, load_image

    cfg = read_params(None, extra)
    sm_key = str(cfg.pop("sm", "esm"))
    am_key = str(cfg.pop("am", "ncc"))
    ssm_key = str(cfg.pop("ssm", "8"))

    map_img = jnp.asarray(np.asarray(load_image(args.map_img),
                                     np.float32).squeeze())
    fprm = FeatureParams(detector=args.detector)
    ssm8 = get_ssm("8")

    trk = create_tracker(sm_key, am_key, ssm_key, **cfg)
    upd = jax.jit(trk.update)

    prev_corners = None
    traj, corners_log = [], []
    for t, frame in enumerate(get_input(args.seq)):
        fnp = np.asarray(frame, np.float32).squeeze()
        fh, fw = fnp.shape[:2]
        # template = central region of the UAV frame, in frame coords
        m = 0.2
        tmpl_corners = np.asarray(
            [[fw * m, fh * m], [fw * (1 - m), fh * m],
             [fw * (1 - m), fh * (1 - m)], [fw * m, fh * (1 - m)]],
            np.float32)

        # global localization by features (frame -> map homography)
        frame_box = _locate(fprm, fnp, np.asarray(map_img), ssm8)
        if frame_box is None and prev_corners is None:
            traj.append((t + 1, np.nan, np.nan))
            continue
        # map the template region through the frame->map estimate
        if frame_box is not None:
            from mtf_tpu.ops import warp as W
            H = W.homography_dlt(
                jnp.asarray([[0, 0], [fw - 1, 0], [fw - 1, fh - 1],
                             [0, fh - 1]], jnp.float32),
                jnp.asarray(frame_box))
            guess = np.asarray(W.apply_warp(H, jnp.asarray(tmpl_corners)))
        else:
            guess = prev_corners

        # direct refinement: template from the UAV frame, registered
        # against the map starting at the feature-localized guess
        st = trk.initialize(jnp.asarray(fnp), jnp.asarray(tmpl_corners))
        st = trk.set_region(st, jnp.asarray(guess))
        st = upd(st, map_img)
        out = np.asarray(trk.corners(st)).T
        if prev_corners is not None and np.linalg.norm(
                out - guess, axis=-1).mean() > args.reloc_err:
            out = guess  # refinement diverged: keep the feature estimate
        prev_corners = out
        corners_log.append(out)
        center = out.mean(axis=0)
        traj.append((t + 1, float(center[0]), float(center[1])))

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "uav_trajectory.txt"), "w") as f:
        f.write("frame x y\n")
        for fr, x, y in traj:
            f.write(f"{fr} {x:.3f} {y:.3f}\n")
    if corners_log:
        write_corners_file(os.path.join(args.out_dir, "uav_corners.txt"),
                           np.stack(corners_log))
    print(f"trajectory of {len(traj)} frames -> "
          f"{args.out_dir}/uav_trajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
