"""Why is the on-chip fleet accuracy leg 1.23px at B=1024 when the CPU
B=32 run of the same protocol reads 0.24px? Compare chip B=32 (same
cells as CPU) and chip B=1024 with per-cell stats."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402
from mtf_tpu.utils.synth import synthetic_sequence  # noqa: E402


def cells(B, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def run_leg(B):
    frame0 = bench._scene(0)
    corners = cells(B)
    sm = create_tracker("fclk", "ssd", "8", resx=50, resy=50, max_iters=10,
                        epsilon=0.0, interp="linear_mm", crop=144,
                        coarse_pt_iters=((4, 6), (2, 3)))
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh, donate=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        frames, gt = synthetic_sequence(np.asarray(frame0),
                                        jnp.asarray(corners), sm.ssm,
                                        n_frames=6, sigma_scale=0.004,
                                        seed=3)
        frames = np.asarray(frames)
    states = fleet.initialize(frame0, corners)
    per_cell = []
    for t in range(1, len(frames)):
        states = fleet.update(states, frames[t])
        c = np.asarray(fleet.corners(states))
        per = np.linalg.norm(np.transpose(c, (0, 2, 1)) - gt[t],
                             axis=-1).mean(-1)
        per_cell.append(per)
        print(f"B={B} t={t}: mean {np.mean(per):.3f} med "
              f"{np.median(per):.3f} p90 {np.percentile(per, 90):.3f} "
              f"max {np.max(per):.2f} argmax {np.argmax(per)}", flush=True)
    per_cell = np.stack(per_cell)  # (T-1, B)
    worst = np.argsort(per_cell.mean(0))[-5:]
    print(f"B={B} worst cells {worst}:")
    for i in worst:
        c = cells(B)[i]
        print(f"  cell {i}: span {c.max(0) - c.min(0)}, center "
              f"{c.mean(0)}, errs {per_cell[:, i].round(2)}")


run_leg(32)
run_leg(1024)
