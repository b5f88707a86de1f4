"""Same-session A/B: gather vs dense-mm sampling for PF500 / RKLT fleets
on the axon TPU. Usage: python scripts/ab_pf_rklt.py [pf|rklt|both]"""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402


def scene(seed=0, h=480, w=640):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch(B, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        out.append([[cx - s, cy - s], [cx + s, cy - s],
                    [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(out, np.float32)


def fleet_fps(sm, B, warmup=3, steps=10):
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    for _ in range(warmup):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(steps):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    return B * steps / (time.perf_counter() - t0)


CONFIGS = {
    "pf": [
        ("pf500-gather", ("pf500", "ssim", "8"),
         dict(resx=25, resy=25, max_iters=1), 32),
        ("pf500-mm256", ("pf500", "ssim", "8"),
         dict(resx=25, resy=25, max_iters=1, interp="linear_mm", crop=256),
         32),
        ("pf500-mm256-bf16", ("pf500", "ssim", "8"),
         dict(resx=25, resy=25, max_iters=1, interp="linear_mm", crop=256,
              interp_bf16=True), 32),
    ],
    "rklt": [
        ("rklt-gather", ("rklt", "ssd", "8"),
         dict(resx=50, resy=50, max_iters=10, epsilon=0.0), 32),
        ("rklt-mm160", ("rklt", "ssd", "8"),
         dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
              interp="linear_mm", crop=160), 32),
    ],
}

which = sys.argv[1] if len(sys.argv) > 1 else "both"
keys = ["pf", "rklt"] if which == "both" else [which]
for k in keys:
    for name, args, kwargs, B in CONFIGS[k]:
        t0 = time.perf_counter()
        try:
            fps = fleet_fps(create_tracker(*args, **kwargs), B)
            print(json.dumps({"config": name, "fps": round(fps, 1),
                              "wall_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:300]}),
                  flush=True)
