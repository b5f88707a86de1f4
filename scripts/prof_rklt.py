"""Trace the RKLT fleet update (B=128) and decode top TPU ops."""
if __name__ != "__main__":
    raise ImportError("one-off profiling driver")
import os, sys, time
import numpy as np
import jax
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import bench
from mtf_tpu import create_tracker
from mtf_tpu.parallel import TrackerFleet, make_mesh

B = 128
def cells(Bn, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(Bn):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx-s,cy-s],[cx+s,cy-s],[cx+s,cy+s],[cx-s,cy+s]])
    return np.asarray(cs, np.float32)

frame0 = bench._scene(0)
sm = create_tracker("rklt", "ssd", "8", resx=50, resy=50, max_iters=10,
                    epsilon=0.0, interp="linear_mm", crop=160)
mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
fleet = TrackerFleet(sm, mesh, donate=True)
st = fleet.initialize(frame0, cells(B))
for _ in range(3):
    st = fleet.update(st, frame0)
jax.block_until_ready(st)
t0 = time.perf_counter()
for _ in range(10):
    st = fleet.update(st, frame0)
jax.block_until_ready(st)
print("fps", B*10/(time.perf_counter()-t0), flush=True)
os.makedirs("log/trace_rklt", exist_ok=True)
with jax.profiler.trace("log/trace_rklt"):
    for _ in range(3):
        st = fleet.update(st, frame0)
    jax.block_until_ready(st)
print("trace done", flush=True)
import collections, glob, gzip, json
f = sorted(glob.glob("log/trace_rklt/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
by = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
        by[e["name"]] += e["dur"]; cnt[e["name"]] += 1
tot = sum(by.values())
print(f"total device us (3 updates): {tot:.0f}")
for n, d in by.most_common(25):
    print(f"{d/1e3:9.3f} ms  x{cnt[n]:5d}  {n[:90]}", flush=True)
