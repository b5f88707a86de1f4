"""Tracker node over the shared-memory frame bridge.

The `sample_tracker_node.cpp` analog of the reference ROS bridge
(`/root/reference/ROS/src/mtf_bridge/src/sample_tracker_node.cpp`): a
standalone process that consumes frames published by a `SharedImageWriter`
(any acquisition process), runs one tracker, and publishes per-frame
corners — here as JSON lines on stdout and/or a corners file, instead of
a ROS topic.

Usage:
    # acquisition process (any producer)
    python - <<'PY'
    from mtf_tpu.bridge import SharedImageWriter
    ...
    PY

    # tracker node
    python -m mtf_tpu.apps.tracker_node --bridge cam0 \
        --corners 110,70,210,70,210,170,110,170 \
        sm esm am ncc ssm 8
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bridge", required=True,
                   help="shared-memory bridge name (SharedImageWriter)")
    p.add_argument("--corners", required=True,
                   help="x1,y1,...,x4,y4 init region on the first frame")
    p.add_argument("--n_frames", type=int, default=-1,
                   help="stop after N frames (-1: until producer stops)")
    p.add_argument("--timeout", type=float, default=5.0,
                   help="seconds to wait for the next frame before exit")
    p.add_argument("--out", help="also write a reference-format corners file")
    p.add_argument("--platform", default=None)
    args, extra = p.parse_known_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.bridge import SharedImageReader
    from mtf_tpu.utils.config import parse_arg_pairs

    cfg = parse_arg_pairs(extra)
    sm = str(cfg.pop("sm", "esm"))
    am = str(cfg.pop("am", "ncc"))
    ssm = str(cfg.pop("ssm", "8"))
    ilm = cfg.pop("ilm", None)
    ilm = None if ilm in (None, "0", 0, "none") else str(ilm)
    tracker = create_tracker(sm, am, ssm, ilm, **cfg)

    corners = np.asarray([float(v) for v in args.corners.split(",")],
                         np.float32).reshape(4, 2)
    reader = SharedImageReader(args.bridge, timeout=args.timeout)
    frame_id, frame = reader.read_latest()
    frame = jnp.asarray(frame[..., 0] if frame.ndim == 3 and
                        frame.shape[-1] == 1 else frame, jnp.float32)
    state = tracker.initialize(frame, jnp.asarray(corners))
    update = jax.jit(tracker.update)
    # readiness handshake: producers should wait for this before
    # streaming (the ROS analog is the subscriber registration)
    print(json.dumps({"event": "initialized", "frame": int(frame_id)}),
          flush=True)

    tracked = []
    t = 0
    while args.n_frames < 0 or t < args.n_frames:
        try:
            frame_id, frame = reader.wait_next(timeout=args.timeout)
        except TimeoutError:
            break
        frame = jnp.asarray(frame[..., 0] if frame.ndim == 3 and
                            frame.shape[-1] == 1 else frame, jnp.float32)
        state = update(state, frame)
        c = np.asarray(tracker.corners(state)).T  # (4, 2)
        tracked.append(c)
        print(json.dumps({"frame": int(frame_id),
                          "corners": c.reshape(-1).round(3).tolist()}),
              flush=True)
        t += 1
    reader.close()
    if args.out and tracked:
        from mtf_tpu.utils.gt import write_corners_file
        write_corners_file(args.out, np.stack(tracked))
    return t


if __name__ == "__main__":
    sys.exit(0 if main() >= 0 else 1)
