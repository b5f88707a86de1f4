"""Factory string-key surface tests (mtf.h registry analog)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.sm.composite import CascadeSM, ParallelSM, PyramidalSM, RKLT
from mtf_tpu.sm.grid import GridTracker
from mtf_tpu.sm.nn import NN
from mtf_tpu.sm.pf import PF

CORNERS = jnp.asarray(np.array(
    [[30.0, 30.0], [80.0, 30.0], [80.0, 70.0], [30.0, 70.0]], np.float32))


def test_lk_keys():
    for key in ["fclk", "fc", "iclk", "ic", "esm", "aesm", "falk", "fa",
                "ialk", "ia", "fcsd"]:
        t = create_tracker(key, "ssd", "2", resx=8, resy=8)
        assert t.name in ("fclk", "iclk", "esm", "aesm", "falk", "ialk", "fcsd")


def test_lm_variants_enable_lm():
    t = create_tracker("eslm", "ncc", "6", resx=8, resy=8)
    assert t.prm.enable_lm


def test_pf_presets():
    t = create_tracker("pf500", "ncc", "4", resx=8, resy=8)
    assert isinstance(t, PF) and t.pf.n_particles == 500
    t2 = create_tracker("pf", "ncc", "2", pf_n_particles=77, resx=8, resy=8)
    assert t2.pf.n_particles == 77


def test_nn_presets():
    t = create_tracker("nn2k", "zncc", "2", resx=8, resy=8)
    assert isinstance(t, NN) and t.nn.n_samples == 2000
    assert isinstance(create_tracker("gnn", "ssd", "2", resx=8, resy=8), NN)


def test_grid_estimators():
    t = create_tracker("lms", "ssd", "8", resx=8, resy=8)
    assert isinstance(t, GridTracker) and t.grid.estimator == "lmeds"
    t2 = create_tracker("ransac", "ssd", "6", resx=8, resy=8)
    assert t2.grid.estimator == "ransac"


def test_rklt_and_composites():
    assert isinstance(create_tracker("rklt", "ncc", "8", resx=10, resy=10), RKLT)
    assert isinstance(create_tracker("nnic", "ssd", "2", resx=8, resy=8),
                      CascadeSM)
    t = create_tracker("prl", "ssd", "2", resx=8, resy=8,
                       members=[("fclk", "ssd", "2"), ("fclk", "ncc", "2")])
    assert isinstance(t, ParallelSM)
    t2 = create_tracker("pyr", "ncc", "2", resx=8, resy=8, pyr_n_levels=2)
    assert isinstance(t2, PyramidalSM)


def test_unknown_keys_raise():
    with pytest.raises(ValueError):
        create_tracker("nosuch", "ssd", "2")
    with pytest.raises(ValueError):
        create_tracker("fclk", "nosuch", "2")
    with pytest.raises(ValueError):
        create_tracker("fclk", "ssd", "nosuch")


def test_end_to_end_smoke(test_image):
    img = jnp.asarray(test_image)
    t = create_tracker("fclk", "ncc", "4", resx=10, resy=10, max_iters=5)
    st = t.initialize(img, CORNERS)
    st = t.update(st, img)
    c = np.asarray(t.corners(st))
    assert c.shape == (2, 4)
    np.testing.assert_allclose(c.T, np.asarray(CORNERS), atol=0.5)
