"""Same-session A/B: eager per-frame dispatch vs update_chunk K=2/4/8.

VERDICT r4 item #2: diagnose the erratic axon update_chunk reading and
either adopt chunked dispatch in bench.py or delete it. Interleaved
measurement windows (A B A B ...) so host contention hits both arms.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

RES = 50
B = 1024
STEPS = 20


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch(Bn, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(Bn):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    mesh = make_mesh({"tracker": 1}, devices=[dev])
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=((4, 6), (2, 3)))
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states0 = fleet.initialize(frame0, corners_batch(B))
    jax.block_until_ready(states0)

    frames = {k: jnp.stack([frame0] * k) for k in (2, 4, 8)}

    def eager_window(states):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            states = fleet.update(states, frame0)
        jax.block_until_ready(states)
        return B * STEPS / (time.perf_counter() - t0), states

    def chunk_window(states, k):
        n = STEPS // k
        t0 = time.perf_counter()
        for _ in range(n):
            states = fleet.update_chunk(states, frames[k])
        jax.block_until_ready(states)
        return B * n * k / (time.perf_counter() - t0), states

    # warm up all programs first (compile once, outside timing)
    st = states0
    for _ in range(3):
        st = fleet.update(st, frame0)
    for k in (2, 4, 8):
        st2 = fleet.update_chunk(states0, frames[k])
        jax.block_until_ready(st2)
    jax.block_until_ready(st)
    print("warmup done", flush=True)

    res = {"eager": [], "k2": [], "k4": [], "k8": []}
    for rep in range(3):
        f, st = eager_window(st)
        res["eager"].append(f)
        for k in (2, 4, 8):
            f, st = chunk_window(st, k)
            res[f"k{k}"].append(f)
        print(f"rep {rep}: " + " ".join(
            f"{a}={res[a][-1]:.0f}" for a in res), flush=True)

    med = {a: sorted(v)[1] for a, v in res.items()}
    print(json.dumps({"median_fps": med, "all": res}))


if __name__ == "__main__":
    main()
