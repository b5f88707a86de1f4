"""Round-5 session-2 chip A/Bs (one experiment per arg, run separately
to keep per-process device memory fresh):
    python scripts/ab_r5b.py pf      # PF downsampled coarse + tight rescore
    python scripts/ab_r5b.py mc      # mcssd coarse packs (+ gray twin)
    python scripts/ab_r5b.py nn      # nn1k interp_precision=highest
"""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json
import sys
import time

import numpy as np  # noqa: F401

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
from mtf_tpu import create_tracker  # noqa: E402
from bench_extra import _fleet_fps  # noqa: E402

which = sys.argv[1]


def run(name, args, kwargs, B, frame3=False, chip_acc=True):
    t0 = time.perf_counter()
    try:
        trk = create_tracker(*args, **kwargs)
        if frame3:
            from bench_extra import _scene3, _corners_batch, WARMUP, STEPS
            from mtf_tpu.parallel import TrackerFleet, make_mesh
            mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
            fleet = TrackerFleet(trk, mesh)
            fr = _scene3(0)
            states = fleet.initialize(fr, _corners_batch(B))
            for _ in range(WARMUP):
                states = fleet.update(states, fr)
            jax.block_until_ready(states)
            t1 = time.perf_counter()
            for _ in range(STEPS):
                states = fleet.update(states, fr)
            jax.block_until_ready(states)
            fps, mcd = B * STEPS / (time.perf_counter() - t1), None
        else:
            fps, mcd = (_fleet_fps(trk, B, chip_acc=True) if chip_acc
                        else (_fleet_fps(trk, B), None))
        out = {"config": name, "fps": round(fps, 1),
               "wall_s": round(time.perf_counter() - t0, 1)}
        if mcd is not None:
            out["chip_mcd_px"] = round(mcd, 3)
        print(json.dumps(out), flush=True)
    except Exception as e:
        print(json.dumps({"config": name, "error": repr(e)[:300]}),
              flush=True)
    jax.clear_caches()


if which == "pf":
    BASE = dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
                max_iters=10, interp="linear_mm", crop=256,
                pf_score_stride=4, pf_score_blur=True,
                pf_rescore_top_k=64, pf_pix_sigma=2.0)
    run("pf-r5ship", ("pffc", "ssim", "8"), BASE, 128)
    run("pf-ds", ("pffc", "ssim", "8"),
        dict(BASE, pf_score_downsample=True), 128)
    run("pf-ds-rc160", ("pffc", "ssim", "8"),
        dict(BASE, pf_score_downsample=True, pf_rescore_crop=160), 128)
    run("pf-ds-rc192", ("pffc", "ssim", "8"),
        dict(BASE, pf_score_downsample=True, pf_rescore_crop=192), 128)
    run("pf-ds-rc160-B256", ("pffc", "ssim", "8"),
        dict(BASE, pf_score_downsample=True, pf_rescore_crop=160), 256)
elif which == "pf2":
    # accuracy push on the winning pf-ds-rc160 point: HIGHEST-precision
    # sampling in the FCLM/SSIM refiner (the nn1k-style chip-floor
    # hypothesis: bf16 sampling noise through the similarity), wider
    # rescore, rc192 re-read (one 3.9k outlier in the first sweep)
    BASE = dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
                max_iters=10, interp="linear_mm", crop=256,
                pf_score_stride=4, pf_score_blur=True,
                pf_rescore_top_k=64, pf_pix_sigma=2.0,
                pf_score_downsample=True, pf_rescore_crop=160)
    run("pf-ds-rc160-hi", ("pffc", "ssim", "8"),
        dict(BASE, interp_precision="highest"), 128)
    run("pf-ds-rc160-top96", ("pffc", "ssim", "8"),
        dict(BASE, pf_rescore_top_k=96), 128)
    run("pf-ds-rc192-rerun", ("pffc", "ssim", "8"),
        dict(BASE, pf_rescore_crop=192), 128)
    run("pf-ds-rc160-rerun", ("pffc", "ssim", "8"), BASE, 128)
elif which == "mc":
    kw = dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
              interp="linear_mm", crop=144)
    co = dict(kw, coarse_pt_iters=((4, 6), (2, 3)))
    run("mcssd-flat", ("fclk", "mcssd", "8"), kw, 512, frame3=True)
    run("mcssd-coarse", ("fclk", "mcssd", "8"), co, 512, frame3=True)
    run("mcssd-coarse-B1024", ("fclk", "mcssd", "8"), co, 1024,
        frame3=True)
    run("gray-coarse", ("fclk", "ssd", "8"), co, 512)
elif which == "pf3":
    # tail-cell push: the fleet-GT mean is dominated by a few hard
    # cells (CPU replica reads the SAME 0.31 as chip — protocol, not
    # numerics); give the FCLM/SSIM refiner a pyramid basin
    BASE = dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
                max_iters=10, interp="linear_mm", crop=256,
                pf_score_stride=4, pf_score_blur=True,
                pf_rescore_top_k=64, pf_pix_sigma=2.0,
                pf_score_downsample=True, pf_rescore_crop=160)
    run("pf-ds-rc160-c25", ("pffc", "ssim", "8"),
        dict(BASE, coarse_pt_iters=((2, 5),)), 128)
    run("pf-ds-rc160-c43", ("pffc", "ssim", "8"),
        dict(BASE, coarse_pt_iters=((4, 3), (2, 3))), 128)
elif which == "pf4":
    # clean confirmation of the refiner-coarse PF points under the
    # final -inf rescore-window semantics
    BASE = dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
                max_iters=10, interp="linear_mm", crop=256,
                pf_score_stride=4, pf_score_blur=True,
                pf_rescore_top_k=64, pf_pix_sigma=2.0,
                pf_score_downsample=True, pf_rescore_crop=160)
    run("pf4-c25", ("pffc", "ssim", "8"),
        dict(BASE, coarse_pt_iters=((2, 5),)), 128)
    run("pf4-c43", ("pffc", "ssim", "8"),
        dict(BASE, coarse_pt_iters=((4, 3), (2, 3))), 128)
    run("pf4-c25-norc", ("pffc", "ssim", "8"),
        dict(BASE, coarse_pt_iters=((2, 5),), pf_rescore_crop=0), 128)
elif which == "esm":
    # banded moment-form NCC kernel vs the pre-band single-tile config
    kw = dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
              interp="linear_mm", crop=144,
              coarse_pt_iters=((4, 6), (2, 3)))
    run("esm-ncc-B1024", ("esm", "ncc", "8"), kw, 1024)
    run("esm-ncc-B512", ("esm", "ncc", "8"), kw, 512)
    run("esm-ncc-flat-B1024", ("esm", "ncc", "8"),
        {k: v for k, v in kw.items() if k != "coarse_pt_iters"}, 1024)
elif which == "sp":
    # spline row chip tuning (first ever): B sweep + iteration budget
    SK = dict(resx=32, resy=32, max_iters=5, epsilon=0.0,
              interp="linear_mm", crop=144)
    run("sp-B64", ("fclk", "ssd", "spline"), SK, 64, chip_acc=False)
    run("sp-B128", ("fclk", "ssd", "spline"), SK, 128, chip_acc=False)
    run("sp-B256", ("fclk", "ssd", "spline"), SK, 256, chip_acc=False)
elif which == "nn":
    NK = dict(resx=25, resy=25, nn_n_samples=1000, enable_lm=True,
              max_iters=10, interp="linear_mm", crop=224,
              n_bins=32, coarse_pt_iters=((2, 5),), nn_dist_feat="raw")
    run("nn-r5ship", ("nnic", "mi", "8"), NK, 256)
    run("nn-hi", ("nnic", "mi", "8"),
        dict(NK, interp_precision="highest"), 256)
