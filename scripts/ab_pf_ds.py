"""A/B: PF hierarchical scoring with score_downsample + rescore_crop
vs the shipped r5 config. CPU multi-seed accuracy (exact-GT synth) or
chip fleet fps (arg "chip").  Usage:
    python scripts/ab_pf_ds.py cpu     # 5-seed accuracy per config
    python scripts/ab_pf_ds.py chip    # fleet fps + chip GT per config
"""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASE = dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
            max_iters=10, interp="linear_mm", crop=256,
            pf_score_stride=4, pf_score_blur=True,
            pf_rescore_top_k=64, pf_pix_sigma=2.0)

CONFIGS = [
    ("r5-ship", dict(BASE)),
    ("ds", dict(BASE, pf_score_downsample=True)),
    ("ds-rc160", dict(BASE, pf_score_downsample=True, pf_rescore_crop=160)),
    ("ds-rc192", dict(BASE, pf_score_downsample=True, pf_rescore_crop=192)),
]

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"

if mode == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mtf_tpu import create_tracker
    sys.path.insert(0, "/root/repo")
    from bench_extra import _synth_acc_impl

    for name, kw in CONFIGS:
        trk = create_tracker("pffc", "ssim", "8", **kw)
        errs = [
            _synth_acc_impl(trk, n_frames=6, sigma_scale=0.005, seed=s)
            for s in (3, 5, 7, 11, 13)]
        print(json.dumps({"config": name,
                          "mcd_px_mean": round(float(np.mean(errs)), 3),
                          "mcd_px_max": round(float(np.max(errs)), 3),
                          "per_seed": [round(e, 3) for e in errs]}),
              flush=True)
else:
    import jax
    from mtf_tpu import create_tracker
    from bench_extra import _fleet_fps

    B = 128
    for name, kw in CONFIGS:
        t0 = time.perf_counter()
        try:
            trk = create_tracker("pffc", "ssim", "8", **kw)
            fps, mcd = _fleet_fps(trk, B, chip_acc=True)
            print(json.dumps({"config": name, "fps": round(fps, 1),
                              "chip_mcd_px": round(mcd, 3),
                              "wall_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)
        jax.clear_caches()
