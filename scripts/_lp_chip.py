import time
import numpy as np
import jax
import jax.numpy as jnp
from mtf_tpu import create_tracker
from mtf_tpu.parallel import TrackerFleet, make_mesh

B, STEPS = 256, 20

def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    return jnp.asarray((img - img.min()) / (img.max() - img.min()) * 255.0, jnp.float32)

def measure(key, ssm, **kw):
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    sm = create_tracker(key, "ssd", ssm, resx=50, resy=50,
                        interp="linear_mm", crop=144, **kw)
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    rng = np.random.default_rng(1)
    corners = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        corners.append([[cx-s, cy-s], [cx+s, cy-s], [cx+s, cy+s], [cx-s, cy+s]])
    states = fleet.initialize(frame0, np.asarray(corners, np.float32))
    for _ in range(3):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
    fps = B * STEPS / (time.perf_counter() - t0)
    print(f"{key}/{ssm}: {fps:.0f} fps", flush=True)

measure("fclk", "4", max_iters=10, epsilon=0.0)
measure("lp", "4", lp_max_iters=10, lp_n_stages=1, epsilon=0.0, lp_n_samples=512)
measure("lp", "4", lp_max_iters=5, lp_n_stages=2, lp_n_samples=512)
