"""Trace the chain-kernel fleet update (headline config) and decode the
top TPU ops. Run from /root/repo: python scripts/prof_r3.py"""
if __name__ != "__main__":
    raise ImportError("one-off profiling driver; run as a script")
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

RES, B = 50, 1024


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


rng = np.random.default_rng(1)
corners = []
for _ in range(B):
    cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
    s = rng.uniform(30, 60)
    corners.append([[cx - s, cy - s], [cx + s, cy - s],
                    [cx + s, cy + s], [cx - s, cy + s]])
corners = np.asarray(corners, np.float32)

sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES, max_iters=10,
                    epsilon=0.0, interp="linear_mm", crop=144,
                    coarse_pt_iters=((4, 6), (2, 3)))
mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
fleet = TrackerFleet(sm, mesh)
frame0 = scene(0)
states = fleet.initialize(frame0, corners)
for _ in range(3):
    states = fleet.update(states, frame0)
jax.block_until_ready(states)
t0 = time.perf_counter()
for _ in range(20):
    states = fleet.update(states, frame0)
jax.block_until_ready(states)
print("fps", B * 20 / (time.perf_counter() - t0), flush=True)

os.makedirs("log/trace_r4b", exist_ok=True)
with jax.profiler.trace("log/trace_r4b"):
    for _ in range(3):
        states = fleet.update(states, frame0)
    jax.block_until_ready(states)
print("trace done", flush=True)

import collections
import glob
import gzip
import json
f = sorted(glob.glob("log/trace_r4b/plugins/profile/*/*.trace.json.gz"))[-1]
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
tot = sum(by_name.values())
print(f"total device us (3 updates): {tot:.0f}")
for n, d in by_name.most_common(28):
    print(f"{d/1e3:9.3f} ms  x{cnt[n]:5d}  {n[:100]}", flush=True)
