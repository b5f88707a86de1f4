"""SPI mask tests (spiUtils analog + ESM wiring, NT/ESM.cc:40-66)."""
import jax.numpy as jnp
import numpy as np

from mtf_tpu import create_tracker
from mtf_tpu.ops import spi
from mtf_tpu.utils import synth


def test_pix_diff_mask_all_ones_when_equal(test_image):
    t = jnp.asarray(test_image[:20, :20].reshape(-1, 1))
    m = np.asarray(spi.pix_diff_mask(t, t, thresh=0.2))
    assert (m > 0.95).all()


def test_pix_diff_mask_rejects_occluded(test_image):
    t = jnp.asarray(test_image[:20, :20].reshape(-1, 1))
    p = np.array(t).copy()
    p[:100] += 200.0  # occlude the first quarter
    m = np.asarray(spi.pix_diff_mask(t, jnp.asarray(p), thresh=0.2))
    assert m[:100].mean() < 0.2
    assert m[100:].mean() > 0.8


def test_gradient_and_gftt_masks_finite(test_image):
    p = jnp.asarray(test_image[:24, :24].reshape(-1, 1))
    for m in (spi.gradient_mask(p, 24, 24), spi.gftt_mask(p, 24, 24)):
        m = np.asarray(m)
        assert m.shape == (576,)
        assert np.isfinite(m).all() and (0 <= m).all() and (m <= 1).all()


def test_esm_with_spi_tracks_under_occlusion(test_image):
    corners = jnp.asarray([[40, 40], [104, 40], [104, 104], [40, 104]],
                          jnp.float32)
    Wm = jnp.array([[1, 0, 2.0], [0, 1, 1.5], [0, 0, 1]], jnp.float32)
    frame1 = np.array(synth.warp_image(jnp.asarray(test_image), Wm))
    frame1[42:106, 42:74] = 255.0  # occlude the left half of the target

    def run(**kw):
        sm = create_tracker("esm", "ssd", "2", resx=32, resy=32,
                            max_iters=30, **kw)
        st = sm.initialize(jnp.asarray(test_image), corners)
        st = sm.update(st, jnp.asarray(frame1))
        out = np.asarray(sm.corners(st)).T
        exp = np.asarray(corners) + np.array([2.0, 1.5], np.float32)
        return np.linalg.norm(out - exp, axis=-1).mean()

    err_spi = run(spi_type="pix_diff", spi_thresh=0.2)
    err_plain = run()
    assert err_spi < 0.6, err_spi
    assert err_spi < err_plain, (err_spi, err_plain)
