"""SimpleTrackingDemo analog: minimal end-to-end tracking walkthrough.

Reference: `/root/reference/Examples/cpp/SimpleTrackingDemo.cc` — the
shortest possible use of the library. Run: `python examples/
simple_tracking_demo.py [source]` (synthetic sequence when omitted).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mtf_tpu import create_tracker
    from mtf_tpu.utils import synth

    if len(sys.argv) > 1:
        from mtf_tpu.video_capture import VideoCapture
        cap = VideoCapture(sys.argv[1])
        ok, f0 = cap.read()
        assert ok, "empty source"
        h, w = f0.squeeze().shape[:2]
        s = min(h, w) / 4
        corners = jnp.asarray([[w/2-s, h/2-s], [w/2+s, h/2-s],
                               [w/2+s, h/2+s], [w/2-s, h/2+s]], jnp.float32)
        frames = [jnp.asarray(f0.squeeze())]
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(jnp.asarray(f.squeeze()))
        gt = None
    else:
        rng = np.random.default_rng(0)
        raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
        img = jnp.asarray((raw - raw.min()) / (raw.max() - raw.min())
                          * 255.0, jnp.float32)
        corners = jnp.asarray([[110, 80], [210, 80], [210, 160], [110, 160]],
                              jnp.float32)
        from mtf_tpu.ssm import get_ssm
        fr, gt = synth.synthetic_sequence(img, np.asarray(corners),
                                          get_ssm("8"), n_frames=10,
                                          sigma_scale=0.02)
        frames = [fr[i] for i in range(fr.shape[0])]

    trk = create_tracker("esm", "ncc", "8")      # ESM + NCC + homography
    state = trk.initialize(frames[0], corners)
    update = jax.jit(trk.update)
    for t, frame in enumerate(frames[1:], 1):
        state = update(state, frame)
        c = np.asarray(trk.corners(state)).T
        line = f"frame {t}: corners {np.round(c[0], 1)} ..."
        if gt is not None:
            line += f"  err={np.linalg.norm(c - gt[t], axis=-1).mean():.3f}px"
        print(line)


if __name__ == "__main__":
    main()
