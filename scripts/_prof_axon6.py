"""Trace the pallas-kernel fleet update to find the 139ms."""
if __name__ != "__main__":  # scratch driver: never run device work on import
    raise ImportError("one-off profiling driver; run as a script")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.chdir(os.path.dirname(os.path.abspath(__file__)))
from mtf_tpu import create_tracker  # noqa: E402

RES, B = 50, 256
frame0 = None


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


rng = np.random.default_rng(1)
cs = []
for _ in range(B):
    cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
    s = rng.uniform(30, 60)
    cs.append([[cx - s, cy - s], [cx + s, cy - s],
               [cx + s, cy + s], [cx - s, cy + s]])
frame0 = scene(0)
sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                    max_iters=10, epsilon=0.0,
                    interp="linear_mm", crop=144)
upd = jax.jit(jax.vmap(sm.update, in_axes=(0, None)))
init = jax.jit(jax.vmap(sm.initialize, in_axes=(None, 0)))
states = init(frame0, jnp.asarray(np.asarray(cs, np.float32)))
for _ in range(2):
    states = upd(states, frame0)
jax.block_until_ready(states)
os.makedirs("log/trace_chain", exist_ok=True)
with jax.profiler.trace("log/trace_chain"):
    for _ in range(2):
        states = upd(states, frame0)
    jax.block_until_ready(states)
print("trace done", flush=True)

import glob
import gzip
import json
import collections
f = sorted(glob.glob("log/trace_chain/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
by_name = collections.Counter()
cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
        by_name[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
for n, d in by_name.most_common(15):
    print(f"{d/1e3:9.3f} ms  x{cnt[n]:5d}  {n[:100]}", flush=True)
