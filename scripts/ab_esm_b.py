if __name__ != "__main__":
    raise ImportError("one-off benchmark driver")
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mtf_tpu import create_tracker
from mtf_tpu.parallel import TrackerFleet, make_mesh

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

for B in (256, 512, 1024):
    sm = create_tracker("esm", "ncc", "8", resx=50, resy=50, max_iters=10,
                        epsilon=0.0, interp="linear_mm", crop=144)
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    for _ in range(3):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(10):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    print(json.dumps({"B": B, "fps": round(B*10/(time.perf_counter()-t0), 1)}),
          flush=True)
