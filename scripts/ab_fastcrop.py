"""Same-session A/B: shared-blur bf16 stacked crop vs old per-window path.

Both arms use donate=True. The toggle is the MTF_NO_FASTCROP env var read
at trace time, so two fleets with different jit caches A/B in one process
(interleaved windows). Also checks corner agreement between the arms.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

RES, B, STEPS = 50, 1024, 20


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


def build(tag):
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=((4, 6), (2, 3)))
    fleet = TrackerFleet(sm, mesh, donate=True)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    return fleet, frame0, states


def main():
    print("device:", jax.devices()[0], flush=True)
    frame0 = scene(0)

    # build + warm both arms (env toggles the traced path)
    os.environ.pop("MTF_NO_FASTCROP", None)
    fleet_new, _, st_new = build("new")
    for _ in range(3):
        st_new = fleet_new.update(st_new, frame0)
    jax.block_until_ready(st_new)
    c_new = np.asarray(fleet_new.corners(st_new))

    os.environ["MTF_NO_FASTCROP"] = "1"
    fleet_old, _, st_old = build("old")
    for _ in range(3):
        st_old = fleet_old.update(st_old, frame0)
    jax.block_until_ready(st_old)
    c_old = np.asarray(fleet_old.corners(st_old))
    os.environ.pop("MTF_NO_FASTCROP", None)
    print("max corner diff new-vs-old after 3 updates:",
          float(np.max(np.abs(c_new - c_old))), flush=True)

    res = {"old": [], "new": []}
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st_old = fleet_old.update(st_old, frame0)
        jax.block_until_ready(st_old)
        res["old"].append(B * STEPS / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st_new = fleet_new.update(st_new, frame0)
        jax.block_until_ready(st_new)
        res["new"].append(B * STEPS / (time.perf_counter() - t0))
        print(f"rep {rep}: old={res['old'][-1]:.0f} new={res['new'][-1]:.0f}",
              flush=True)
    med = {a: sorted(v)[1] for a, v in res.items()}
    med["speedup"] = med["new"] / med["old"]
    print(json.dumps(med))


if __name__ == "__main__":
    main()
