"""Ground-truth and tracking-result file I/O in the reference formats.

Formats (reference `objUtils.cc:944` readGT; writer `runMTF.cc:359`,
`miscUtils.h:446-468`):
    GT / corners file: header `frame ulx uly urx ury lrx lry llx lly`,
    then one row per frame: `frame<N>.jpg x1 y1 x2 y2 x3 y3 x4 y4`.
"""
from __future__ import annotations

import os

import numpy as np

HEADER = "frame ulx uly urx ury lrx lry llx lly"


def read_corners_file(path: str) -> np.ndarray:
    """-> (T, 4, 2) float32 corner array (ul, ur, lr, ll)."""
    rows = []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            if i == 0 and not _is_float(parts[1]):
                continue  # header
            vals = [float(v) for v in parts[-8:]]
            rows.append(np.asarray(vals, np.float32).reshape(4, 2))
    return np.stack(rows)


def write_corners_file(path: str, corners: np.ndarray,
                       frame_names: list | None = None) -> None:
    """corners: (T, 4, 2)."""
    corners = np.asarray(corners)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        for t, c in enumerate(corners):
            name = (frame_names[t] if frame_names
                    else f"frame{t + 1:05d}.jpg")
            vals = " ".join(f"{v:.4f}" for v in c.reshape(-1))
            f.write(f"{name} {vals}\n")


def write_errors_file(path: str, errors) -> None:
    """Per-frame error file (`.err` outputs, runMTF.cc)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("frame error\n")
        for t, e in enumerate(np.asarray(errors)):
            f.write(f"frame{t + 2:05d}.jpg {e:.6f}\n")


def write_sr_file(path: str, thresholds, sr) -> None:
    """Success-rate curve file (`.sr` outputs, runMTF.cc:771-776)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for t, s in zip(np.asarray(thresholds), np.asarray(sr)):
            f.write(f"{t:.4f}\t{s:.6f}\n")


def append_tracking_stats(path: str, line: str) -> None:
    """log/tracking_stats.txt accumulator (runMTF.cc:794-808)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(line.rstrip() + "\n")


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False
