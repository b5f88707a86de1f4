"""Learned components: DFM feature AM + RegNet regression SM + hrch.

Reference: AM/src/DFM.cc (Caffe feature AM), SM/src/NT/RegNet.cc
(regression-network SM), HESM.h (hierarchical SM).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.utils import synth


@pytest.fixture(scope="module")
def scene(request):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    img = gaussian_filter(rng.standard_normal((128, 160)), 3.0)
    img = jnp.asarray(
        (img - img.min()) / (img.max() - img.min()) * 255.0, jnp.float32)
    corners = jnp.asarray([[40, 40], [104, 40], [104, 104], [40, 104]],
                          jnp.float32)
    Wm = jnp.array([[1, 0, 2.0], [0, 1, -1.5], [0, 0, 1]], jnp.float32)
    frame1 = synth.warp_image(img, Wm)
    exp = np.asarray(corners) + np.array([2.0, -1.5], np.float32)
    return img, corners, frame1, exp


def _track_err(sm, scene):
    img, corners, frame1, exp = scene
    st = sm.initialize(img, corners)
    st = sm.update(st, frame1)
    return np.linalg.norm(np.asarray(sm.corners(st)).T - exp,
                          axis=-1).mean()


def test_dfm_fclk_tracks(scene):
    sm = create_tracker("fclk", "dfm", "2", resx=24, resy=24, max_iters=30)
    assert _track_err(sm, scene) < 1.0


def test_dfm_feature_shapes(scene):
    from mtf_tpu.am import AMParams, get_am
    am = get_am("dfm", AMParams(resx=16, resy=16))
    img, corners, _, _ = scene
    patch = jnp.asarray(np.asarray(img)[:16, :16].reshape(256, 1))
    f = am._features(patch)
    assert f.shape == (256, 16)   # default feature widths (8, 16)
    assert np.isfinite(np.asarray(f)).all()


def test_regnet_tracks(scene):
    sm = create_tracker("regnet", "ssd", "2", resx=24, resy=24,
                        rg_n_samples=500, rg_train_steps=200)
    assert _track_err(sm, scene) < 2.0


def test_hrch_tracks_hom(scene):
    sm = create_tracker("hrch", "ncc", "8", resx=24, resy=24, max_iters=20)
    assert _track_err(sm, scene) < 1.0
