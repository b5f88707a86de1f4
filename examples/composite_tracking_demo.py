"""CompositeTrackingDemo analog: cascade / pyramidal / parallel trackers.

Reference: `/root/reference/Examples/cpp/CompositeTrackingDemo.cc` —
demonstrates building composite search methods around base trackers. Here
three composites track the same synthetic 8-DOF sequence and report
per-frame mean corner distance:

  * `pyr`  — image-pyramid coarse-to-fine ESM/NCC
  * `casc` — particle-filter -> FCLK cascade (stochastic seeding + refine)
  * `prl`  — parallel {ESM, FCLK} fused by mean corners

Run: `python examples/composite_tracking_demo.py`
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
    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils import synth

    rng = np.random.default_rng(0)
    raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
    img = jnp.asarray((raw - raw.min()) / (raw.max() - raw.min()) * 255.0,
                      jnp.float32)
    corners0 = np.array([[110, 80], [210, 80], [210, 160], [110, 160]],
                        np.float32)
    frames, gt = synth.synthetic_sequence(img, corners0, get_ssm("8"),
                                          n_frames=10, sigma_scale=0.02,
                                          seed=3)

    trackers = {
        "pyr(esm/ncc/8)": create_tracker(
            "pyr", "ncc", "8", base_sm="esm", n_levels=3, max_iters=15),
        "casc(pf->fclk)": create_tracker(
            "casc", "ssd", "8",
            members=[("pf", "ssd", "8"), ("fclk", "ssd", "8")]),
        "prl(esm|fclk)": create_tracker(
            "prl", "ncc", "8",
            members=[("esm", "ncc", "8"), ("fclk", "ncc", "8")]),
    }

    for name, trk in trackers.items():
        state = trk.initialize(frames[0], jnp.asarray(gt[0]))
        errs = []
        for t in range(1, len(frames)):
            state = trk.update(state, frames[t])
            c = np.asarray(trk.corners(state)).T
            errs.append(float(np.mean(np.linalg.norm(c - gt[t], axis=-1))))
        print(f"{name:18s} mean MCD {np.mean(errs):6.3f} px   "
              f"max {np.max(errs):6.3f} px")


if __name__ == "__main__":
    main()
