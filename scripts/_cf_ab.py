"""A/B: CF trackers with grayscale vs fHOG features (VERDICT r1 #6).

Synthetic protocol designed to separate the two feature sets: a textured
(non-blob) target undergoing translation + scale with global illumination
swings (gain/bias per frame) and background clutter — the conditions fHOG's
gradient orientation + local normalization are built for.
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

os.chdir(os.path.dirname(os.path.abspath(__file__)))
import mtf_tpu  # noqa: E402
from mtf_tpu.ops import interp  # noqa: E402


def scene(seed, h=240, w=320):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 180.0
    # textured target: checkerboard-ish patch blended in the middle
    yy, xx = np.mgrid[0:h, 0:w]
    tex = 60.0 * (np.sin(xx / 3.5) * np.sin(yy / 4.5))
    mask = ((np.abs(xx - w / 2) < 28) & (np.abs(yy - h / 2) < 28))
    img = img + tex * mask
    return jnp.asarray(img[..., None], jnp.float32)


def warp_frame(img, dx, dy, s, gain, bias):
    h, w = img.shape[:2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pts = jnp.stack([((xx - cx - dx) / s + cx).ravel(),
                     ((yy - cy - dy) / s + cy).ravel()], axis=-1)
    f = interp.sample(img, pts, "linear", "replicate").reshape(img.shape)
    return gain * f + bias


def run(key, features, seed):
    img = scene(seed)
    h, w = img.shape[:2]
    c0 = np.array([[w/2-25, h/2-25], [w/2+25, h/2-25],
                   [w/2+25, h/2+25], [w/2-25, h/2+25]], np.float32)
    trk = mtf_tpu.create_tracker(sm=key, features=features)
    st = trk.initialize(img, c0)
    upd = jax.jit(trk.update)
    rng = np.random.default_rng(seed + 100)
    dx = dy = 0.0
    s = 1.0
    errs = []
    for t in range(1, 25):
        dx += rng.uniform(-3.5, 3.5)
        dy += rng.uniform(-3.5, 3.5)
        s *= rng.uniform(0.985, 1.015)
        gain = rng.uniform(0.75, 1.3)
        bias = rng.uniform(-25, 25)
        st = upd(st, warp_frame(img, dx, dy, s, gain, bias))
        c = np.asarray(trk.corners(st)).T
        center = c.mean(axis=0)
        expect = c0.mean(axis=0) + np.array([dx, dy])
        errs.append(float(np.linalg.norm(center - expect)))
    return float(np.mean(errs)), float(np.max(errs))


for key in ["kcf", "dsst"]:
    for features in ["gray", "hog"]:
        means, maxs = [], []
        for seed in range(4):
            m, mx = run(key, features, seed)
            means.append(m)
            maxs.append(mx)
        print(f"{key:5s} {features:4s}: mean_err {np.mean(means):6.2f}px  "
              f"worst {np.max(maxs):6.2f}px  per-seed means "
              f"{[round(x,1) for x in means]}", flush=True)
