if __name__ != "__main__":
    raise ImportError("debug driver")
import sys, traceback
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mtf_tpu import create_tracker
from mtf_tpu.parallel import TrackerFleet, make_mesh

rng = np.random.default_rng(0)
img = np.cumsum(np.cumsum(rng.normal(0, 1, (480, 640)), 0), 1)
img = (img - img.min()) / (img.max() - img.min()) * 255.0
frame = jnp.asarray(img, jnp.float32)
sm = create_tracker("nnic", "mi", "8", resx=25, resy=25, nn_n_samples=1000,
                    enable_lm=True, max_iters=10, interp="linear_mm", crop=224)
mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
fleet = TrackerFleet(sm, mesh)
rng2 = np.random.default_rng(1)
cs = []
for _ in range(64):
    cx, cy = rng2.uniform(120, 520), rng2.uniform(100, 380)
    s0 = rng2.uniform(30, 60)
    cs.append([[cx-s0, cy-s0], [cx+s0, cy-s0], [cx+s0, cy+s0], [cx-s0, cy+s0]])
corners = np.asarray(cs, np.float32)
try:
    states = fleet.initialize(frame, corners)
    states = fleet.update(states, frame)
    jax.block_until_ready(states)
    print("OK")
except Exception:
    traceback.print_exc()
