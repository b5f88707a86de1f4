"""Same-session A/B of final headline bench configs: B and dispatch
chunking under the ((4,5),(2,4)) coarse schedule."""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch(Bn, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(Bn):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        out.append([[cx - s, cy - s], [cx + s, cy - s],
                    [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(out, np.float32)


def run(tag, B, chunk):
    sm = create_tracker("fclk", "ssd", "8", resx=50, resy=50,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=((4, 5), (2, 4)))
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    steps = 20
    if chunk > 1:
        frames = jnp.stack([frame0] * chunk)
        states = fleet.update_chunk(states, frames)
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        for _ in range(steps // chunk):
            states = fleet.update_chunk(states, frames)
    else:
        for _ in range(3):
            states = fleet.update(states, frame0)
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        for _ in range(steps):
            states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    fps = B * steps / (time.perf_counter() - t0)
    print(json.dumps({"variant": tag, "fps": round(fps, 1)}), flush=True)


import itertools
def run2(tag, B, phases):
    sm = create_tracker("fclk", "ssd", "8", resx=50, resy=50,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=phases)
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    for _ in range(3):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(20):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    print(json.dumps({"variant": tag,
                      "fps": round(B * 20 / (time.perf_counter() - t0), 1)}),
          flush=True)

run2("B1024-cur", 1024, ((4, 5), (2, 4)))
run2("B1536-cur", 1536, ((4, 5), (2, 4)))
run2("B1024-s463", 1024, ((4, 6), (2, 3)))
run2("B1024-s472", 1024, ((4, 7), (2, 2)))
