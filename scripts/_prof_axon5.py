"""Same-session A/B: XLA dense path vs chain-fused Pallas kernel (B=256
fleet, FCLK-SSD-hom8 50x50x10it, crop 144). Run on axon."""
import time

import numpy as np


def scene(seed=0, h=480, w=640):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch(B, seed=1):
    rng = np.random.default_rng(seed)
    cs = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def run(use_pallas, B=256, warmup=3, steps=20):
    import jax
    from mtf_tpu import create_tracker
    from mtf_tpu.parallel import TrackerFleet, make_mesh

    mesh = make_mesh({"tracker": 1}, devices=[jax.devices()[0]])
    kw = {} if use_pallas == "auto" else {"use_pallas": use_pallas}
    sm = create_tracker("fclk", "ssd", "8", resx=50, resy=50,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144, **kw)
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
    dt = time.perf_counter() - t0
    c = np.asarray(fleet.corners(states))
    return B * steps / dt, c


def main():
    import sys
    if "--sweep" in sys.argv:
        for b in (1024, 1536):
            fps, _ = run("auto", B=b)
            print(f"B={b}: {fps:,.0f} fps/chip", flush=True)
        return
    fps_x, c_x = run(False)
    print(f"XLA dense:    {fps_x:,.0f} fps/chip", flush=True)
    fps_p, c_p = run("auto")
    print(f"chain-fused:  {fps_p:,.0f} fps/chip  "
          f"({fps_p / fps_x - 1:+.1%} vs XLA)", flush=True)
    # converged-corner agreement between the two paths
    d = np.linalg.norm(c_x - c_p, axis=1).max()
    print(f"max corner disagreement: {d:.4f} px", flush=True)


if __name__ == "__main__":
    main()
