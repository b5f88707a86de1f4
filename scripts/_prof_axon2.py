"""Round-2 perf session #2: unstacked-Jacobian XLA path vs new Pallas
kernel, fleet scale. Baseline from this session: 14473 fps (stacked)."""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.chdir(os.path.dirname(os.path.abspath(__file__)))
from mtf_tpu import create_tracker  # noqa: E402

RES, B, WARMUP, STEPS = 50, 256, 3, 20


def scene(seed=0, h=480, w=640):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def corners_batch():
    rng = np.random.default_rng(1)
    cs = []
    for _ in range(B):
        cx, cy = rng.uniform(120, 520), rng.uniform(100, 380)
        s = rng.uniform(30, 60)
        cs.append([[cx - s, cy - s], [cx + s, cy - s],
                   [cx + s, cy + s], [cx - s, cy + s]])
    return np.asarray(cs, np.float32)


def measure(label, donate=False, **kw):
    frame0 = scene(0)
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144, **kw)
    fn = jax.vmap(sm.update, in_axes=(0, None))
    upd = jax.jit(fn, donate_argnums=(0,) if donate else ())
    init = jax.jit(jax.vmap(sm.initialize, in_axes=(None, 0)))
    states = init(frame0, jnp.asarray(corners_batch()))
    states0 = states
    for _ in range(WARMUP):
        states = upd(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        states = upd(states, frame0)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0
    fps = B * STEPS / dt
    print(json.dumps({"config": label, "fps": round(fps, 1),
                      "ms_per_update": round(1e3 * dt / STEPS, 3)}),
          flush=True)
    if not donate:
        # correctness proxy: corners after 1 update on a shifted frame
        # must match the gather-path reference
        from mtf_tpu.ops import interp as I
        h, w = 480, 640
        xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        ptsg = jnp.stack([(xx + 1.5).ravel(), (yy - 0.7).ravel()], -1)
        f1 = I.sample(frame0, ptsg, "linear", "replicate").reshape(h, w)
        s1 = upd(states0, f1)
        c = np.asarray(jax.vmap(sm.corners)(s1))
        exp = np.transpose(np.asarray(corners_batch()), (0, 2, 1)) \
            + np.array([-1.5, 0.7])[None, :, None]
        err = float(np.mean(np.linalg.norm(c - exp, axis=1)))
        print(json.dumps({"config": label + "_1step_err_px",
                          "value": round(err, 4)}), flush=True)
    return fps


measure("xla_parts")
measure("pallas_v2", use_pallas=True)
measure("xla_parts_donate", donate=True)
measure("pallas_v2_donate", donate=True, use_pallas=True)
