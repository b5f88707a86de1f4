"""Protocol sequences #2/#3: occlusion + scale change (VERDICT r4 #8).

Extends `real_protocol.py` with the two failure modes its handheld
sequence does not exercise, and runs the LEARNING/DETECTION trackers
(tld, cmt, strk, mil, frg) under the full reinit-on-failure protocol on
them (reference `runMTF.cc:499-547` semantics + the ThirdParty/TLD
re-acquisition behavior):

- **occlusion**: handheld camera + a textured occluder sweeping across
  the target, covering it fully for ~15 frames mid-sequence. Tests the
  validity gates (TLD conservative similarity, CMT forward-backward
  consistency, grid inlier fraction) and re-acquisition after the
  occluder passes.
- **scale**: a +/-40% zoom-in/zoom-out trajectory with slow roll — the
  scale-adaptation leg (DSST's motivating case; here every SSM carries
  scale natively).

Output: log/realseq2_rows.json + artifacts in log/realseq2_*;
REALSEQ.md gains a section. Run: python scripts/real_protocol2.py
"""
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
os.chdir("/root/repo")

from real_protocol import make_photo, handheld_trajectory  # noqa: E402

H, W = 480, 640
N_FRAMES = 120


def _write_seq(seq_dir, frames, gt_lines, name):
    import cv2
    os.makedirs(seq_dir, exist_ok=True)
    for t, frame in enumerate(frames):
        cv2.imwrite(os.path.join(seq_dir, f"frame{t + 1:05d}.jpg"),
                    np.clip(frame, 0, 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
    with open(os.path.join(seq_dir, f"{name}.txt"), "w") as f:
        f.write("frame ulx uly urx ury lrx lry llx lly\n")
        for t, c in enumerate(gt_lines):
            f.write(f"frame{t + 1:05d}.jpg " +
                    " ".join(f"{v:.4f}" for v in c) + "\n")


def _gt_of(M, corners0):
    hom = np.concatenate([M @ np.array([x, y, 1.0])
                          for x, y in corners0]).reshape(4, 3)
    return (hom[:, :2] / hom[:, 2:3]).reshape(-1)


def record_occlusion(seq_dir):
    """Handheld motion + a textured occluder crossing the target."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mtf_tpu.utils.synth import warp_image

    photo = make_photo(seed=21)
    mats = handheld_trajectory(N_FRAMES, seed=9)
    corners0 = np.array([[250, 170], [390, 170], [390, 310], [250, 310]],
                        np.float32)
    rng = np.random.default_rng(4)
    occ_tex = np.clip(
        rng.normal(140, 40, (200, 160)), 0, 255).astype(np.float32)
    frames, gt_lines = [], []
    for t, M in enumerate(mats):
        frame = np.array(warp_image(jnp.asarray(photo),
                                    jnp.asarray(M, jnp.float32)))
        # occluder sweeps left->right across the target between
        # frames 40 and 80 (fully covering it around frames 55-70)
        if 35 <= t <= 90:
            ox = int(np.interp(t, [35, 90], [40, 560]))
            oy = 140 + int(8 * np.sin(t / 5.0))
            y1, x1 = min(H, oy + 200), min(W, ox + 160)
            frame[oy:y1, ox:x1] = occ_tex[:y1 - oy, :x1 - ox]
        frame = frame + rng.normal(0, 1.5, frame.shape)
        frames.append(frame)
        gt_lines.append(_gt_of(M, corners0))
    _write_seq(seq_dir, frames, gt_lines, "occl")


def record_scale(seq_dir):
    """Zoom-in to 1.4x, back out to 0.75x, with slow roll."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mtf_tpu.utils.synth import warp_image

    photo = make_photo(seed=31)
    corners0 = np.array([[250, 170], [390, 170], [390, 310], [250, 310]],
                        np.float32)
    cx, cy = 320.0, 240.0
    rng = np.random.default_rng(5)
    frames, gt_lines = [], []
    for t in range(N_FRAMES):
        ph = 2 * np.pi * t / N_FRAMES
        s = 1.0 + 0.38 * np.sin(ph) - 0.08 * (1 - np.cos(2 * ph))
        th = 0.15 * np.sin(ph / 2)
        jx, jy = rng.normal(0, 0.8, 2)      # handheld jitter
        c, sn = np.cos(th), np.sin(th)
        M = np.array([[s * c, -s * sn, cx - s * (c * cx - sn * cy) + jx],
                      [s * sn, s * c, cy - s * (sn * cx + c * cy) + jy],
                      [0, 0, 1.0]])
        frame = np.asarray(warp_image(jnp.asarray(photo),
                                      jnp.asarray(M, jnp.float32)))
        frame = frame + rng.normal(0, 1.5, frame.shape)
        frames.append(frame)
        gt_lines.append(_gt_of(M, corners0))
    _write_seq(seq_dir, frames, gt_lines, "scale")


# learning/detection roster + two direct baselines for context
CONFIGS = [
    ("tld", ["sm", "tld", "am", "ssd", "ssm", "4"]),
    ("cmt", ["sm", "cmt", "am", "ssd", "ssm", "4"]),
    ("strk", ["sm", "strk", "am", "ssd", "ssm", "2"]),
    ("mil", ["sm", "mil", "am", "ssd", "ssm", "2"]),
    ("frg", ["sm", "frg", "am", "ssd", "ssm", "2"]),
    ("rklt", ["sm", "rklt", "am", "ssd", "ssm", "8", "max_iters", "10",
              "interp", "linear_mm", "crop", "160"]),
    ("esm_ncc", ["sm", "esm", "am", "ncc", "ssm", "8", "max_iters", "10",
                 "interp", "linear_mm", "crop", "144"]),
]


def evaluate(seq_dir, gt_name, out_prefix):
    import re
    rows = []
    for name, cfg in CONFIGS:
        out = subprocess.run(
            [sys.executable, "-m", "mtf_tpu.apps.run_mtf",
             "--seq", seq_dir, "--gt", os.path.join(seq_dir, gt_name),
             "--platform", "cpu", "--write_outputs",
             "--reinit_on_failure", "--reinit_err_thresh", "20",
             "--out_dir", f"log/{out_prefix}_{name}"] + cfg,
            capture_output=True, text=True, timeout=5400)
        m = re.search(r"frames=(\d+) fps=([\d.]+) avg_mcd=([\d.a-z]+) "
                      r"mean_sr=([\d.]+) failures=(\d+)", out.stdout)
        if m:
            stats = {"frames": int(m.group(1)),
                     "cpu_fps": float(m.group(2)),
                     "avg_mcd_px": float(m.group(3)),
                     "mean_sr": float(m.group(4)),
                     "reinits": int(m.group(5))}
        else:
            stats = {"error": (out.stdout[-200:] + out.stderr[-300:])}
        print(out_prefix, name, stats, flush=True)
        rows.append({"config": name, **stats})
    return rows


def main():
    seqs = [("/tmp/mtf_realseq_occl", "occl.txt", "occl",
             record_occlusion),
            ("/tmp/mtf_realseq_scale", "scale.txt", "scale",
             record_scale)]
    all_rows = {}
    for seq_dir, gt, prefix, rec in seqs:
        if not os.path.exists(os.path.join(seq_dir, gt)):
            rec(seq_dir)
            print(f"recorded {prefix} -> {seq_dir}", flush=True)
        all_rows[prefix] = evaluate(seq_dir, gt, f"realseq2_{prefix}")
    with open("log/realseq2_rows.json", "w") as f:
        json.dump(all_rows, f, indent=1)
    print(json.dumps(all_rows))


if __name__ == "__main__":
    main()
