"""Same-session sweep: coarse-kernel group size x JTJ precision x B.
Env knobs are read at trace time, so each arm builds its own fleet."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

STEPS = 20


def cells(B, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def arm(tag, B, grp, jtj_default):
    os.environ["MTF_CHAIN_GRP"] = str(grp)
    if jtj_default:
        os.environ["MTF_JTJ_DEFAULT"] = "1"
    else:
        os.environ.pop("MTF_JTJ_DEFAULT", None)
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    sm = create_tracker("fclk", "ssd", "8", resx=50, resy=50,
                        max_iters=10, epsilon=0.0, interp="linear_mm",
                        crop=144, coarse_pt_iters=((4, 6), (2, 3)))
    fleet = TrackerFleet(sm, mesh, donate=True)
    frame0 = bench._scene(0)
    st = fleet.initialize(frame0, cells(B))
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
    fps = sorted(rates)[1]
    c = np.asarray(fleet.corners(st))
    print(f"{tag}: {fps:.0f} fps", flush=True)
    jax.clear_caches()
    return fps, c


res = {}
res["base_g8"], c_ref = arm("base_g8", 1024, 8, False)
res["g16"], c16 = arm("g16", 1024, 16, False)
res["g32"], _ = arm("g32", 1024, 32, False)
res["g16_jtjdef"], cjd = arm("g16_jtjdef", 1024, 16, True)
res["g8_B1280"], _ = arm("g8_B1280", 1280, 8, False)
res["base_g8_again"], _ = arm("base_g8_again", 1024, 8, False)
print(json.dumps(res))
print("jtj-default corner diff vs ref:",
      float(np.max(np.abs(cjd - c_ref))))
