"""Tracking visualization: region/grid/particle drawing + video recording.

The reference draws tracked regions and diagnostics live into OpenCV
windows and optionally records them (`runMTF.cc:607-674` drawing/record
path; per-tracker colors from `objUtils.cc` col_rgb). Headless-first
here: `annotate` renders corners onto a frame, `VideoRecorder` writes the
annotated stream; live display stays optional (`show`).
"""
from __future__ import annotations

import numpy as np

# reference per-tracker color rotation (objUtils col_rgb order, BGR)
COLORS = [(0, 0, 255), (0, 255, 0), (255, 0, 0), (0, 255, 255),
          (255, 0, 255), (255, 255, 0), (255, 255, 255), (0, 0, 0)]


def to_bgr_u8(frame) -> np.ndarray:
    """float gray/RGB frame -> uint8 BGR canvas for drawing."""
    f = np.asarray(frame)
    f = np.clip(f, 0.0, 255.0).astype(np.uint8)
    if f.ndim == 2:
        return np.repeat(f[..., None], 3, axis=-1)
    return f[..., ::-1].copy()  # RGB -> BGR


def draw_region(canvas: np.ndarray, corners, color=(0, 255, 0),
                thickness: int = 2, label: str | None = None) -> np.ndarray:
    """Draw a (4, 2) corner polygon (drawRegion analog, miscUtils)."""
    import cv2  # type: ignore
    pts = np.asarray(corners, np.float32).reshape(4, 2)
    cv2.polylines(canvas, [pts.astype(np.int32).reshape(-1, 1, 2)],
                  isClosed=True, color=color, thickness=thickness)
    if label:
        org = pts.min(axis=0).astype(int)
        cv2.putText(canvas, label, (int(org[0]), max(12, int(org[1]) - 4)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)
    return canvas


def draw_points(canvas: np.ndarray, pts, color=(0, 255, 255),
                radius: int = 1) -> np.ndarray:
    """Scatter grid-tracker points / PF particles (the reference's grid
    and particle debug windows)."""
    import cv2  # type: ignore
    for x, y in np.asarray(pts, np.float32).reshape(-1, 2):
        cv2.circle(canvas, (int(x), int(y)), radius, color, -1)
    return canvas


def annotate(frame, regions, labels=None, gt=None) -> np.ndarray:
    """Render one frame: tracked region(s) in rotation colors, optional
    GT in white (the runMTF display composition)."""
    canvas = to_bgr_u8(frame)
    regions = np.asarray(regions, np.float32).reshape(-1, 4, 2)
    for i, r in enumerate(regions):
        lbl = labels[i] if labels else None
        draw_region(canvas, r, COLORS[i % len(COLORS)], 2, lbl)
    if gt is not None:
        draw_region(canvas, gt, (255, 255, 255), 1, "gt")
    return canvas


class VideoRecorder:
    """Annotated tracking video writer (the record path of runMTF)."""

    def __init__(self, path: str, fps: float = 30.0):
        self.path = path
        self.fps = fps
        self._writer = None

    def write(self, canvas: np.ndarray) -> None:
        import cv2  # type: ignore
        if self._writer is None:
            h, w = canvas.shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            self._writer = cv2.VideoWriter(self.path, fourcc, self.fps,
                                           (w, h))
        self._writer.write(canvas)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None
