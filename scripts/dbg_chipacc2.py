"""Bisect the on-chip 1.25px accuracy bias: XLA dense f32 vs chain
kernel, with/without coarse phases, on the same B=32 moving sequence."""
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


B = 32
frame0 = bench._scene(0)
corners = cells(B)
ssm_ref = create_tracker("fclk", "ssd", "8").ssm
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    frames, gt = synthetic_sequence(np.asarray(frame0),
                                    jnp.asarray(corners), ssm_ref,
                                    n_frames=6, sigma_scale=0.004, seed=3)
    frames = np.asarray(frames)


def leg(label, **kw):
    base = dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
                interp="linear_mm", crop=144)
    base.update(kw)
    sm = create_tracker("fclk", "ssd", "8", **base)
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh, donate=True)
    states = fleet.initialize(frame0, corners)
    errs = []
    for t in range(1, len(frames)):
        states = fleet.update(states, frames[t])
        c = np.asarray(fleet.corners(states))
        per = np.linalg.norm(np.transpose(c, (0, 2, 1)) - gt[t],
                             axis=-1).mean(-1)
        errs.append(per)
    errs = np.stack(errs)
    print(f"{label}: mean {errs.mean():.3f} med {np.median(errs):.3f} "
          f"max {errs.max():.2f}", flush=True)


leg("xla_f32_full10", use_pallas=False)
leg("xla_f32_coarse", use_pallas=False, coarse_pt_iters=((4, 6), (2, 3)))
leg("chain_full10", use_pallas=None)
leg("chain_coarse", use_pallas=None, coarse_pt_iters=((4, 6), (2, 3)))
