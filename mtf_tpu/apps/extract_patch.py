"""extractPatch analog: sample the tracked/GT region patches of a sequence.

Reference: `/root/reference/Examples/cpp/extractPatch.cc` — write the
resampled (resx x resy) patch inside the GT region of each frame.

Usage:
    python -m mtf_tpu.apps.extract_patch --seq frames_dir --gt gt.txt \
        --out_dir patches --resx 50 --resy 50
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seq", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--out_dir", default="patches")
    p.add_argument("--resx", type=int, default=50)
    p.add_argument("--resy", type=int, default=50)
    p.add_argument("--interp", default="linear")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu.ops import interp, warp as W
    from mtf_tpu.utils.gt import read_corners_file
    from mtf_tpu.utils.input import get_input

    gt = read_corners_file(args.gt)
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for i, frame in enumerate(get_input(args.seq)):
        if i >= len(gt):
            break
        grid = W.grid_from_corners(jnp.asarray(gt[i]), args.resx, args.resy)
        f3 = np.asarray(frame, np.float32)
        f3 = f3[..., None] if f3.ndim == 2 else f3
        patch = interp.sample(jnp.asarray(f3), grid, args.interp)
        img = np.asarray(patch).reshape(args.resy, args.resx, -1)
        try:
            import cv2
            cv2.imwrite(os.path.join(args.out_dir, f"patch{i + 1:05d}.jpg"),
                        np.clip(img, 0, 255).astype(np.uint8))
        except ImportError:
            np.save(os.path.join(args.out_dir, f"patch{i + 1:05d}.npy"), img)
        n += 1
    print(f"extracted {n} patches -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
