"""FeatureTracker tests (reference SM/src/FeatureTracker.cc)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.sm.feature import _descr_float, _match
from mtf_tpu.utils import synth


@pytest.fixture(scope="module")
def blob_image():
    rng = np.random.default_rng(0)
    img = np.zeros((240, 320), np.float32)
    for _ in range(300):
        x, y = rng.integers(5, 315), rng.integers(5, 235)
        img[y - 2:y + 3, x - 2:x + 3] = rng.uniform(50, 255)
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(img, 1.0).astype(np.float32)


def test_match_identity():
    rng = np.random.default_rng(1)
    d = (rng.random((40, 256)) > 0.5).astype(np.float32)
    idx, ok = _match(jnp.asarray(d), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(40))
    assert np.asarray(ok).all()


def test_descr_float_binary_roundtrip():
    d = np.array([[0b10100000, 0b00000001]], np.uint8)
    f = _descr_float(d)
    assert f.shape == (1, 16)
    assert f[0, 0] == 1 and f[0, 2] == 1 and f[0, 15] == 1
    assert f.sum() == 3


def test_tracks_affine_warp(blob_image):
    corners = jnp.asarray([[80, 60], [240, 60], [240, 180], [80, 180]],
                          jnp.float32)
    trk = create_tracker("feat", "ssd", "8")
    st = trk.initialize(jnp.asarray(blob_image), corners)
    Wm = jnp.array([[1.02, 0.01, 3.0], [0.0, 0.99, -2.0], [0, 0, 1]],
                   jnp.float32)
    frame1 = synth.warp_image(jnp.asarray(blob_image), Wm)
    st = trk.update(st, frame1)
    out = np.asarray(trk.corners(st)).T
    exp = np.asarray(
        jnp.matmul(Wm[:2, :2], jnp.asarray(corners).T).T + Wm[:2, 2])
    assert np.linalg.norm(out - exp, axis=-1).mean() < 2.0


def test_holds_state_on_featureless_frame(blob_image):
    corners = jnp.asarray([[80, 60], [240, 60], [240, 180], [80, 180]],
                          jnp.float32)
    trk = create_tracker("feat", "ssd", "8")
    st = trk.initialize(jnp.asarray(blob_image), corners)
    blank = jnp.zeros_like(jnp.asarray(blob_image))
    st2 = trk.update(st, blank)
    np.testing.assert_allclose(np.asarray(trk.corners(st2)),
                               np.asarray(trk.corners(st)))
