"""Same-session A/B on the headline config: host-dispatch variants.

A: fleet.update as-is (device_put of the frame every call)
B: frame pre-replicated once, jitted update called directly
C: B + donate_argnums=0 (serving steady-state: donate the state buffers)
D: C at B=2048
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mtf_tpu import create_tracker  # noqa: E402
from mtf_tpu.parallel import TrackerFleet, make_mesh  # noqa: E402

RES = 50
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


def make_fleet(B):
    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144,
                        coarse_pt_iters=((4, 6), (2, 3)))
    fleet = TrackerFleet(sm, mesh)
    frame0 = scene(0)
    states = fleet.initialize(frame0, corners_batch(B))
    return fleet, mesh, frame0, states


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    fleet, mesh, frame0, states0 = make_fleet(1024)
    sh_b = NamedSharding(mesh, P("tracker"))
    sh_r = NamedSharding(mesh, P())
    frame_r = jax.device_put(frame0, sh_r)

    upd_plain = jax.jit(jax.vmap(fleet.sm.update, in_axes=(0, None)),
                        in_shardings=(sh_b, sh_r), out_shardings=sh_b)
    upd_don = jax.jit(jax.vmap(fleet.sm.update, in_axes=(0, None)),
                      in_shardings=(sh_b, sh_r), out_shardings=sh_b,
                      donate_argnums=(0,))

    def win_A(st):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st = fleet.update(st, frame0)
        jax.block_until_ready(st)
        return 1024 * STEPS / (time.perf_counter() - t0), st

    def win_B(st):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st = upd_plain(st, frame_r)
        jax.block_until_ready(st)
        return 1024 * STEPS / (time.perf_counter() - t0), st

    def win_C(st):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st = upd_don(st, frame_r)
        jax.block_until_ready(st)
        return 1024 * STEPS / (time.perf_counter() - t0), st

    st = states0
    for _ in range(3):
        st = fleet.update(st, frame0)
    st = upd_plain(st, frame_r)
    st = upd_don(st, frame_r)
    jax.block_until_ready(st)
    print("warm", flush=True)

    res = {"A_update": [], "B_prerep": [], "C_donate": []}
    for rep in range(3):
        f, st = win_A(st)
        res["A_update"].append(f)
        f, st = win_B(st)
        res["B_prerep"].append(f)
        f, st = win_C(st)
        res["C_donate"].append(f)
        print(f"rep {rep}: " + " ".join(
            f"{a}={res[a][-1]:.0f}" for a in res), flush=True)
    med = {a: sorted(v)[1] for a, v in res.items()}
    print(json.dumps({"median_fps_B1024": med}))

    # D: B=2048 with the best dispatch form
    fleet2, mesh2, frame2, st2 = make_fleet(2048)
    sh_b2 = NamedSharding(mesh2, P("tracker"))
    sh_r2 = NamedSharding(mesh2, P())
    frame_r2 = jax.device_put(frame2, sh_r2)
    upd2 = jax.jit(jax.vmap(fleet2.sm.update, in_axes=(0, None)),
                   in_shardings=(sh_b2, sh_r2), out_shardings=sh_b2,
                   donate_argnums=(0,))
    for _ in range(3):
        st2 = upd2(st2, frame_r2)
    jax.block_until_ready(st2)
    d = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st2 = upd2(st2, frame_r2)
        jax.block_until_ready(st2)
        d.append(2048 * STEPS / (time.perf_counter() - t0))
        print("D rep", d[-1], flush=True)
    print(json.dumps({"median_fps_B2048_donate": sorted(d)[1]}))


if __name__ == "__main__":
    main()
