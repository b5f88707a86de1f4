"""Milestone-config benchmark rows (BASELINE.md configs #2-#5).

Each entry measures fleet throughput per chip for one of the reference's
headline configurations (`/root/reference/ReadMe.md:430-438`) plus a
quick synthetic-accuracy figure (mean corner distance over a short
known-warp sequence, the generateSyntheticSeq protocol — SURVEY.md §4.2).
Imported lazily by bench.py; every row is best-effort.
"""
import time

import numpy as np

WARMUP = 3
STEPS = 10


def _scene(seed=0, h=480, w=640):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def _corners_batch(B, seed=1):
    rng = np.random.default_rng(seed)
    corners = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        corners.append([[cx - s, cy - s], [cx + s, cy - s],
                        [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(corners, np.float32)


def _fleet_fps(sm, B):
    """Steady-state fleet updates/s on the first (real) device."""
    import jax
    from mtf_tpu.parallel import TrackerFleet, make_mesh

    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh)
    frame0 = _scene(0)
    states = fleet.initialize(frame0, _corners_batch(B))
    for _ in range(WARMUP):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    return B * STEPS / (time.perf_counter() - t0)


def _synth_acc(sm, n_frames=6, sigma_scale=0.01, seed=3):
    """Mean corner distance on a short exact-GT synthetic sequence (CPU
    path of the same program; accuracy is backend-independent)."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        # run on the host CPU device: avoids minutes of per-config
        # compile + per-frame dispatch over the axon tunnel for a
        # backend-independent number
        with jax.default_device(cpu):
            return _synth_acc_impl(sm, n_frames, sigma_scale, seed)
    return _synth_acc_impl(sm, n_frames, sigma_scale, seed)


def _synth_acc_impl(sm, n_frames, sigma_scale, seed):
    import jax.numpy as jnp
    from mtf_tpu.utils import synth

    img = _scene(7, 240, 320)
    corners0 = np.array([[110, 80], [210, 80], [210, 160], [110, 160]],
                        np.float32)
    frames, gt = synth.synthetic_sequence(img, corners0, sm.ssm,
                                          n_frames=n_frames,
                                          sigma_scale=sigma_scale, seed=seed)
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    errs = []
    for i in range(1, len(frames)):
        state = sm.update(state, frames[i])
        c = np.asarray(sm.corners(state)).T
        errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
    return float(np.mean(errs))


def _row(metric, sm_args, sm_kwargs, B, acc_sigma=0.01):
    from mtf_tpu import create_tracker
    sm = create_tracker(*sm_args, **sm_kwargs)
    fps = _fleet_fps(sm, B)
    acc = _synth_acc(sm, sigma_scale=acc_sigma)
    return {"metric": metric, "value": round(fps, 1), "unit": "frames/s",
            "fleet": B, "synth_mcd_px": round(acc, 3)}


def bench_esm_ncc():
    """BASELINE config #2: ESM + NCC on 8-DOF homography."""
    return _row("esm_ncc_hom8_frames_per_sec_per_chip",
                ("esm", "ncc", "8"),
                dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
                     interp="linear_mm", crop=144), B=256)


def bench_pf500():
    """BASELINE config #4 (single-chip half): PF(500) + FCLM/SSIM/hom —
    the reference headline config (ReadMe.md:434, LinTrack towel)."""
    return _row("pf500_fclm_ssim_hom8_frames_per_sec_per_chip",
                ("pffc", "ssim", "8"),
                dict(resx=25, resy=25, pf_n_particles=500, enable_lm=True,
                     max_iters=10, interp="linear_mm", crop=256), B=32,
                acc_sigma=0.005)


def bench_nn1k():
    """NN(1k) + ICLM/MI/hom — the reference headline config
    (ReadMe.md:433)."""
    return _row("nn1k_iclm_mi_hom8_frames_per_sec_per_chip",
                ("nnic", "mi", "8"),
                dict(resx=25, resy=25, nn_n_samples=1000, enable_lm=True,
                     max_iters=10, interp="linear_mm", crop=224), B=64,
                acc_sigma=0.005)


def bench_rklt():
    """BASELINE config #5 (single-chip half): RKLT = grid + RANSAC +
    template ESM refiner."""
    return _row("rklt_ssd_hom8_frames_per_sec_per_chip",
                ("rklt", "ssd", "8"),
                dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
                     interp="linear_mm", crop=160),
                B=32)


EXTRA_CONFIGS = [
    ("esm_ncc_hom8_frames_per_sec_per_chip", bench_esm_ncc),
    ("pf500_fclm_ssim_hom8_frames_per_sec_per_chip", bench_pf500),
    ("nn1k_iclm_mi_hom8_frames_per_sec_per_chip", bench_nn1k),
    ("rklt_ssd_hom8_frames_per_sec_per_chip", bench_rklt),
]
