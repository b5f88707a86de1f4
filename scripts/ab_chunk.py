"""Same-session A/B: chunked multi-frame dispatch vs per-frame dispatch."""
if __name__ != "__main__":
    raise ImportError("one-off benchmark driver; run as a script")
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mtf_tpu import create_tracker
from mtf_tpu.parallel import TrackerFleet, make_mesh

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

sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES, max_iters=10,
                    epsilon=0.0, interp="linear_mm", crop=144,
                    coarse_pt_iters=((4, 5), (2, 3)))
mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
fleet = TrackerFleet(sm, mesh)
frame0 = scene(0)
states0 = fleet.initialize(frame0, corners_batch(B))

# per-frame dispatch
states = states0
for _ in range(3):
    states = fleet.update(states, frame0)
jax.block_until_ready(states)
t0 = time.perf_counter()
for _ in range(20):
    states = fleet.update(states, frame0)
jax.block_until_ready(states)
print(json.dumps({"variant": "per-frame", "fps": round(B*20/(time.perf_counter()-t0),1)}), flush=True)
c0 = np.asarray(jax.vmap(sm.corners)(states))

for K in (2, 4):
    frames = jnp.stack([frame0]*K)
    states = states0
    states = fleet.update_chunk(states, frames)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(20 // K):
        states = fleet.update_chunk(states, frames)
    jax.block_until_ready(states)
    fps = B*20/(time.perf_counter()-t0)
    c1 = np.asarray(jax.vmap(sm.corners)(states))
    print(json.dumps({"variant": f"chunk-{K}", "fps": round(fps,1),
                      "corner_diff": float(np.max(np.abs(c1-c0)))}), flush=True)
