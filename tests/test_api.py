"""pyMTF-compatible procedural API (reference pyMTF.cc:24-44 surface)."""
import jax.numpy as jnp
import numpy as np

import mtf_tpu.api as pymtf
from mtf_tpu.utils import synth


def test_create_track_setregion_remove(test_image):
    corners = np.array([[40, 104, 104, 40], [40, 40, 104, 104]], np.float32)
    tid = pymtf.create(test_image, corners, sm="fclk", am="ssd", ssm="2",
                       resx=32, resy=32)
    assert tid in pymtf.getTrackerIds()

    Wm = jnp.array([[1, 0, 1.5], [0, 1, -1.0], [0, 0, 1]], jnp.float32)
    frame1 = np.asarray(synth.warp_image(jnp.asarray(test_image), Wm))
    out = pymtf.getRegion(frame1, tid)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(
        out, corners + np.array([[1.5], [-1.0]]), atol=0.3)

    pymtf.setRegion(corners, tid)
    # 4x2 corner layout accepted too
    pymtf.setRegion(corners.T, tid)
    pymtf.remove(tid)
    assert tid not in pymtf.getTrackerIds()


def test_multiple_trackers_independent(test_image):
    c1 = np.array([[40, 90, 90, 40], [40, 40, 90, 90]], np.float32)
    c2 = np.array([[70, 130, 130, 70], [50, 50, 110, 110]], np.float32)
    t1 = pymtf.create(test_image, c1, sm="fclk", am="ssd", ssm="2",
                      resx=24, resy=24)
    t2 = pymtf.create(test_image, c2, sm="fclk", am="ssd", ssm="2",
                      resx=24, resy=24)
    assert t1 != t2
    out1 = pymtf.getRegion(test_image, t1)
    out2 = pymtf.getRegion(test_image, t2)
    np.testing.assert_allclose(out1, c1, atol=0.1)
    np.testing.assert_allclose(out2, c2, atol=0.1)
    pymtf.remove(t1)
    pymtf.remove(t2)
