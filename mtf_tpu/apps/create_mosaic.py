"""createMosaic analog: build a mosaic from tracked inter-frame warps.

Reference: `/root/reference/Examples/cpp/createMosaic.cc` (ReadMe.md:244):
track the whole-frame registration between consecutive frames, compose the
warps into each frame's pose in mosaic coordinates, and blend the frames
into one canvas.

Usage:
    python -m mtf_tpu.apps.create_mosaic --seq frames_dir \
        --out mosaic.jpg --scale 2.0 sm esm am ncc ssm 8
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seq", required=True)
    p.add_argument("--out", default="mosaic.jpg")
    p.add_argument("--scale", type=float, default=2.0,
                   help="mosaic canvas = scale x frame size")
    p.add_argument("--margin", type=float, default=0.15,
                   help="inner-region margin used for tracking")
    p.add_argument("--platform", default="cpu")
    args, extra = p.parse_known_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.ops import interp
    from mtf_tpu.ops import warp as W
    from mtf_tpu.utils.config import read_params
    from mtf_tpu.utils.input import get_input
    from mtf_tpu.utils.synth import full_grid

    cfg = read_params(None, extra)
    frames = [np.asarray(f, np.float32) for f in get_input(args.seq)]
    h, w = frames[0].shape[:2]
    m = args.margin
    corners = jnp.asarray([[w * m, h * m], [w * (1 - m), h * m],
                           [w * (1 - m), h * (1 - m)], [w * m, h * (1 - m)]],
                          jnp.float32)

    sm = str(cfg.pop("sm", cfg.pop("mtf_sm", "esm")))
    am = str(cfg.pop("am", cfg.pop("mtf_am", "ncc")))
    ssm = str(cfg.pop("ssm", cfg.pop("mtf_ssm", "8")))
    trk = create_tracker(sm, am, ssm, **cfg)
    upd = jax.jit(trk.update)

    H, Wd = int(h * args.scale), int(w * args.scale)
    canvas = np.zeros((H, Wd) + frames[0].shape[2:], np.float32)
    weight = np.zeros((H, Wd), np.float32)
    off = np.array([[1, 0, (Wd - w) / 2], [0, 1, (H - h) / 2], [0, 0, 1]],
                   np.float32)  # first frame centered

    pose = off.copy()  # frame -> mosaic
    grid = full_grid(H, Wd)

    def blend(frame, pose_mat):
        """Paste `frame` into the canvas at `pose_mat` (frame->mosaic)."""
        inv = jnp.asarray(np.linalg.inv(pose_mat), jnp.float32)
        pts = W.apply_warp(inv, grid)            # mosaic px -> frame coords
        f3 = frame[..., None] if frame.ndim == 2 else frame
        vals = interp.sample(jnp.asarray(f3), pts, "linear", "constant")
        inside = jnp.logical_and(
            jnp.logical_and(pts[:, 0] >= 0, pts[:, 0] <= w - 1),
            jnp.logical_and(pts[:, 1] >= 0, pts[:, 1] <= h - 1))
        v = np.asarray(vals).reshape(H, Wd, -1)
        msk = np.asarray(inside, np.float32).reshape(H, Wd)
        if frame.ndim == 2:
            v = v[..., 0]
        return v, msk

    v, msk = blend(jnp.asarray(frames[0]), pose)
    canvas += (v.T * msk.T).T if canvas.ndim == 2 else v * msk[..., None]
    weight += msk

    state = trk.initialize(jnp.asarray(frames[0]), corners)
    prev_corners = np.asarray(corners)
    for f in frames[1:]:
        fj = jnp.asarray(f)
        state = upd(state, fj)
        cur = np.asarray(trk.corners(state)).T          # (4,2) in new frame
        # inter-frame warp prev->cur, composed into the running pose
        M = np.asarray(W.homography_dlt(jnp.asarray(prev_corners),
                                        jnp.asarray(cur)))
        pose = pose @ np.linalg.inv(M)
        v, msk = blend(fj, pose)
        if canvas.ndim == 2:
            new = weight == 0
            canvas[new] = v[new]
            weight += msk
        else:
            new = weight == 0
            canvas[new] = v[new]
            weight += msk
        # re-anchor the tracker each frame (small inter-frame motion)
        state = trk.initialize(fj, corners)
        prev_corners = np.asarray(corners)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    try:
        import cv2
        cv2.imwrite(args.out, np.clip(canvas, 0, 255).astype(np.uint8))
    except ImportError:
        np.save(os.path.splitext(args.out)[0] + ".npy", canvas)
    print(f"mosaic ({H}x{Wd}) written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
