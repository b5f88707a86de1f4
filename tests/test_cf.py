"""Correlation-filter trackers (MOSSE/KCF/DSST) — sm/cf.py.

The reference treats these as bundled third-party code; here they are
native FFT-domain programs, so they get the same synthetic-recovery
treatment as the registration SMs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mtf_tpu
from mtf_tpu.ops import interp


def _base_image(rng, h=160, w=160):
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # smooth so subpixel interpolation behaves
    k = np.ones(5) / 5
    for ax in (0, 1):
        img = np.apply_along_axis(np.convolve, ax, img, k, mode="same")
    # a strong blob target in the middle for the filters to lock onto
    yy, xx = np.mgrid[0:h, 0:w]
    img += 120 * np.exp(-(((xx - w / 2) / 9.0) ** 2 +
                          ((yy - h / 2) / 9.0) ** 2))
    return jnp.asarray(img[..., None])


def _shifted(img, dx, dy):
    h, w = img.shape[:2]
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pts = jnp.stack([(xx + dx).ravel(), (yy + dy).ravel()], axis=-1)
    return interp.sample(img, pts, "linear", "replicate").reshape(img.shape)


def _zoomed(img, s):
    """Image scaled by s about its center (target appears s x larger)."""
    h, w = img.shape[:2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pts = jnp.stack([((xx - cx) / s + cx).ravel(),
                     ((yy - cy) / s + cy).ravel()], axis=-1)
    return interp.sample(img, pts, "linear", "replicate").reshape(img.shape)


CORNERS0 = np.array([[60.0, 60.0], [100.0, 60.0],
                     [100.0, 100.0], [60.0, 100.0]], np.float32)


@pytest.mark.parametrize("key", ["mosse", "kcf", "dsst"])
def test_cf_tracks_translation(key):
    rng = np.random.RandomState(0)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm=key)
    st = trk.initialize(img, CORNERS0)
    upd = jax.jit(trk.update)
    total = np.zeros(2)
    for t in range(1, 9):
        dx, dy = 1.5 * t, -1.0 * t
        st = upd(st, _shifted(img, -dx, -dy))  # content moves by (+dx,+dy)
        total = np.array([dx, dy])
    c = np.asarray(trk.corners(st)).T           # (4, 2)
    center = c.mean(axis=0)
    expect = CORNERS0.mean(axis=0) + total
    assert np.linalg.norm(center - expect) < 2.5, (key, center, expect)


def test_dsst_recovers_scale():
    rng = np.random.RandomState(1)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm="dsst")
    st = trk.initialize(img, CORNERS0)
    upd = jax.jit(trk.update)
    s = 1.0
    for _ in range(10):
        s *= 1.03
        st = upd(st, _zoomed(img, s))
    assert float(st.scale) > 1.12, float(st.scale)


@pytest.mark.parametrize("key", ["mosse", "kcf", "dsst"])
def test_cf_state_is_pytree_and_vmappable(key):
    rng = np.random.RandomState(2)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm=key)
    st = trk.initialize(img, CORNERS0)
    leaves = jax.tree_util.tree_leaves(st)
    assert leaves, "state must be a pytree"
    # fleet of 3 identical trackers: vmap over stacked states + frames
    batch_st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (3,) + jnp.shape(x)), st)
    frames = jnp.broadcast_to(_shifted(img, -1.0, 0.0),
                              (3,) + img.shape)
    out = jax.vmap(trk.update)(batch_st, frames)
    assert jax.tree_util.tree_leaves(out)[0].shape[0] == 3


def test_cf_set_region_and_reinit():
    rng = np.random.RandomState(3)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm="kcf")
    st = trk.initialize(img, CORNERS0)
    moved = CORNERS0 + 7.0
    st2 = trk.set_region(st, moved)
    c = np.asarray(trk.corners(st2)).T
    assert np.allclose(c.mean(axis=0), moved.mean(axis=0), atol=1e-4)
    st3 = trk.reinitialize(img, moved)
    c3 = np.asarray(trk.corners(st3)).T
    assert np.allclose(c3, moved, atol=1e-4)


def test_hog_features_shape_and_invariance():
    from mtf_tpu.ops.hog import hog, N_HOG_CHANNELS
    rng = np.random.RandomState(4)
    p = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    f = hog(p, n_orient=9, cell=4)
    assert f.shape == (16, 16, N_HOG_CHANNELS)
    assert np.all(np.isfinite(np.asarray(f)))
    # block normalization makes features gain-invariant
    f2 = hog(2.5 * p, n_orient=9, cell=4)
    assert np.allclose(np.asarray(f), np.asarray(f2), atol=1e-3)
    # and bias-invariant (gradients kill constants)
    f3 = hog(p + 40.0, n_orient=9, cell=4)
    assert np.allclose(np.asarray(f), np.asarray(f3), atol=1e-3)


@pytest.mark.parametrize("key", ["mosse", "kcf", "dsst"])
def test_cf_psr_failure_signal(key):
    """PSR is high while locked on, collapses when the target vanishes."""
    rng = np.random.RandomState(5)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm=key)
    st = trk.initialize(img, CORNERS0)
    upd = jax.jit(trk.update)
    st = upd(st, _shifted(img, -1.0, 0.5))
    psr_locked = float(st.psr)
    blank = jnp.asarray(rng.uniform(0, 255, img.shape).astype(np.float32))
    st = upd(st, blank)
    psr_lost = float(st.psr)
    assert psr_locked > psr_lost, (key, psr_locked, psr_lost)
    assert psr_locked > 6.0, (key, psr_locked)


def test_cf_psr_gate_freezes_filter():
    """With psr_thresh set, a garbage frame must not corrupt the model."""
    rng = np.random.RandomState(6)
    img = _base_image(rng)
    trk = mtf_tpu.create_tracker(sm="mosse", psr_thresh=6.0)
    st = trk.initialize(img, CORNERS0)
    upd = jax.jit(trk.update)
    st = upd(st, _shifted(img, -1.0, 0.0))
    num_before = np.asarray(st.num)
    blank = jnp.asarray(rng.uniform(0, 255, img.shape).astype(np.float32))
    st2 = upd(st, blank)
    assert float(st2.psr) < 6.0
    assert np.allclose(np.asarray(st2.num), num_before), \
        "filter learned from a low-PSR frame"
