"""VERDICT r4 #10: one real-device A/B of the parts sampling kernel
(ops/pallas/dense_sample.py) on a non-fusable config (ESM/NCC — esm_jac
+ non-SSD AM, so the chain kernel can't take it). Keep or delete."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

B, STEPS = 256, 10


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch(Bn, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(Bn):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def run(use_pallas):
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    sm = create_tracker("esm", "ncc", "8", resx=50, resy=50,
                        max_iters=10, epsilon=0.0, interp="linear_mm",
                        crop=144, use_pallas=use_pallas)
    fleet = TrackerFleet(sm, mesh, donate=True)
    frame0 = scene(0)
    st = fleet.initialize(frame0, corners_batch(B))
    for _ in range(3):
        st = fleet.update(st, frame0)
    jax.block_until_ready(st)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st = fleet.update(st, frame0)
        jax.block_until_ready(st)
        rates.append(B * STEPS / (time.perf_counter() - t0))
    c = np.asarray(fleet.corners(st))
    return sorted(rates)[1], c


fps_x, c_x = run(False)
print("xla:", fps_x, flush=True)
fps_p, c_p = run(True)
print("parts:", fps_p, flush=True)
print(json.dumps({"xla_fps": fps_x, "parts_fps": fps_p,
                  "max_corner_diff": float(np.max(np.abs(c_x - c_p)))}))
