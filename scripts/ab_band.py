"""Same-session A/B: y-banded vs full-height chain-kernel sampling dots
on the axon TPU headline config (FCLK/SSD/hom8 50x50, B=256, crop=144).
Also cross-checks corners between the two variants on a real warped
sequence step."""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import mtf_tpu.ops.pallas.lk_fused as lkf  # noqa: E402
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

RES, B = 50, 256


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


def run(tag):
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144)
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
    fps = B * 20 / (time.perf_counter() - t0)
    # corners after updates on a second (shifted) frame for x-check
    states = fleet.update(states, scene(0))
    c = np.asarray(jax.vmap(lambda s: sm.corners(s))(states))
    print(json.dumps({"variant": tag, "fps": round(fps, 1)}), flush=True)
    return c


unbanded = lambda n, hc: (lkf._tile_of(n), hc)  # noqa: E731
orig = lkf._chain_tile_of

t0 = time.perf_counter()
lkf._chain_tile_of = unbanded
c_a = run("full-height")
lkf._chain_tile_of = orig
c_b = run("y-banded")
print(json.dumps({"corner_max_abs_diff_px": float(np.max(np.abs(c_a - c_b))),
                  "total_wall_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
