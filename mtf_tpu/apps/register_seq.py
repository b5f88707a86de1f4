"""registerSeq analog: whole-sequence registration / stabilization.

Reference: `/root/reference/Examples/cpp/registerSeq.cc` — track a region
through the sequence, then render each frame warped by the *inverse* of
its estimated warp (registerSeq.cc:199-201) so the tracked region stays
fixed: video stabilization / sequence registration.

Usage:
    python -m mtf_tpu.apps.register_seq --seq frames_dir --gt gt.txt \
        --out_dir registered sm esm am ncc ssm 8
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seq", required=True)
    p.add_argument("--gt", help="GT file for the init region")
    p.add_argument("--out_dir", default="registered")
    p.add_argument("--platform", default="cpu")
    p.add_argument("--interp", default="linear")
    args, extra = p.parse_known_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.ops import warp as W
    from mtf_tpu.utils.config import read_params
    from mtf_tpu.utils.gt import read_corners_file
    from mtf_tpu.utils.input import get_input
    from mtf_tpu.utils.synth import warp_image

    cfg = read_params(None, extra)
    src = get_input(args.seq)
    frames = [np.asarray(f, np.float32) for f in src]
    if args.gt:
        corners0 = jnp.asarray(read_corners_file(args.gt)[0])
    else:
        h, w = frames[0].shape[:2]
        s = min(h, w) / 4
        corners0 = jnp.asarray([[w / 2 - s, h / 2 - s], [w / 2 + s, h / 2 - s],
                                [w / 2 + s, h / 2 + s], [w / 2 - s, h / 2 + s]],
                               jnp.float32)

    sm = str(cfg.pop("sm", cfg.pop("mtf_sm", "esm")))
    am = str(cfg.pop("am", cfg.pop("mtf_am", "ncc")))
    ssm = str(cfg.pop("ssm", cfg.pop("mtf_ssm", "8")))
    trk = create_tracker(sm, am, ssm, **cfg)
    state = trk.initialize(jnp.asarray(frames[0]), corners0)

    os.makedirs(args.out_dir, exist_ok=True)

    def save(i, f):
        try:
            import cv2
            cv2.imwrite(os.path.join(args.out_dir, f"frame{i:05d}.jpg"),
                        np.clip(np.asarray(f), 0, 255).astype(np.uint8))
        except ImportError:
            np.save(os.path.join(args.out_dir, f"frame{i:05d}.npy"),
                    np.asarray(f))

    save(1, frames[0])
    upd = jax.jit(trk.update)
    for i, f in enumerate(frames[1:], start=2):
        fj = jnp.asarray(f)
        state = upd(state, fj)
        # image-space warp of the tracked region: template->image;
        # rendering with it as the sampling map pulls the region back to
        # its initial place (the registerSeq.cc:199-201 inversion)
        c_img = trk.corners(state).T          # (4, 2) current
        M = np.asarray(W.homography_dlt(jnp.asarray(corners0), c_img))
        # warp_image renders I(M^-1 x); stabilization needs out(x) =
        # frame(M x), i.e. the scene moved back by M^-1
        reg = warp_image(fj, jnp.asarray(np.linalg.inv(M), jnp.float32),
                         args.interp)
        save(i, reg)
    print(f"registered {len(frames)} frames -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
