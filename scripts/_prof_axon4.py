"""Fused lk kernel vs XLA path, fleet scale, + accuracy."""
import json, os, time
import numpy as np
import jax
import jax.numpy as jnp
os.chdir(os.path.dirname(os.path.abspath(__file__)))
from mtf_tpu import create_tracker

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
        cs.append([[cx-s,cy-s],[cx+s,cy-s],[cx+s,cy+s],[cx-s,cy+s]])
    return np.asarray(cs, np.float32)

def measure(label, donate=False, **kw):
    frame0 = scene(0)
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144, **kw)
    upd = jax.jit(jax.vmap(sm.update, in_axes=(0, None)),
                  donate_argnums=(0,) if donate else ())
    init = jax.jit(jax.vmap(sm.initialize, in_axes=(None, 0)))
    states = init(frame0, jnp.asarray(corners_batch()))
    for _ in range(WARMUP):
        states = upd(states, frame0)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        states = upd(states, frame0)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0
    print(json.dumps({"config": label, "fps": round(B*STEPS/dt, 1),
                      "ms_per_update": round(1e3*dt/STEPS, 3)}), flush=True)

def accuracy(label, **kw):
    from mtf_tpu.utils import synth
    sm = create_tracker("fclk", "ssd", "8", resx=RES, resy=RES,
                        max_iters=10, epsilon=0.0,
                        interp="linear_mm", crop=144, **kw)
    img = scene(3, 240, 320)
    c0 = np.array([[110,80],[210,80],[210,160],[110,160]], np.float32)
    frames, gt = synth.synthetic_sequence(img, c0, sm.ssm, n_frames=8,
                                          sigma_scale=0.01, seed=7)
    st = sm.initialize(frames[0], jnp.asarray(gt[0]))
    upd = jax.jit(sm.update)
    errs = []
    for i in range(1, len(frames)):
        st = upd(st, frames[i])
        c = np.asarray(sm.corners(st)).T
        errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
    print(json.dumps({"config": label, "max_err_px": round(max(errs), 4)}),
          flush=True)

measure("xla_base")
measure("fused", use_pallas=True)
measure("fused_donate", donate=True, use_pallas=True)
accuracy("acc_xla")
accuracy("acc_fused", use_pallas=True)
