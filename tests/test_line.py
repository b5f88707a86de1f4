"""LineTracker tests (reference SM/src/LineTracker.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.sm.line import _fit_line, _intersect
from mtf_tpu.ssm import get_ssm
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

CORNERS0 = np.array([[50.0, 40.0], [120.0, 40.0], [120.0, 105.0],
                     [50.0, 105.0]], np.float32)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((180, 220)), 2.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


def test_fit_line_exact():
    pts = jnp.asarray([[0.0, 1.0], [1.0, 2.0], [2.0, 3.0], [3.0, 4.0]])
    mu, d = _fit_line(pts, jnp.ones(4))
    # direction along (1, 1)/sqrt(2)
    assert abs(abs(float(d[0])) - abs(float(d[1]))) < 1e-5


def test_intersect():
    p = _intersect(jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]),
                   jnp.asarray([2.0, -1.0]), jnp.asarray([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), [2.0, 0.0], atol=1e-5)


def test_line_tracker_sequence(base_image):
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    get_ssm("hom"), n_frames=5,
                                    sigma_scale=0.01, seed=21)
    sm = create_tracker("line", "ssd", "8", grid_res=8)
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(sm.corners(state)).T, gt[t]))
    assert max(errs) < 3.0, errs


def test_line_constraint_resists_patch_corruption(base_image):
    """Corrupt a block of the scene: line-snapped centers should keep the
    grid geometry more rigid than unconstrained patches."""
    Wm = jnp.array([[1, 0, 1.0], [0, 1, 0.5], [0, 0, 1]], jnp.float32)
    from mtf_tpu.utils.synth import warp_image
    frame1 = np.array(warp_image(base_image, Wm))
    frame1[60:90, 70:110] = 255.0  # occluding blob inside the target

    def err_of(key):
        sm = create_tracker(key, "ssd", "8", grid_res=8)
        st = sm.initialize(base_image, jnp.asarray(CORNERS0))
        st = sm.update(st, jnp.asarray(frame1))
        exp = CORNERS0 + np.array([1.0, 0.5], np.float32)
        return np.linalg.norm(np.asarray(sm.corners(st)).T - exp,
                              axis=-1).mean()

    assert err_of("line") < 3.0
