"""Linear-predictor (hyperplane) SM tests (sm/lp.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

CORNERS0 = np.array([[50.0, 40.0], [110.0, 40.0], [110.0, 95.0],
                     [50.0, 95.0]], np.float32)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((160, 200)), 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


@pytest.mark.parametrize("ssm_key,sigma", [("2", 0.03), ("4", 0.015)])
def test_lp_tracks(base_image, ssm_key, sigma):
    trk = create_tracker("lp", "ssd", ssm_key, resx=20, resy=20,
                         lp_n_samples=400)
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    trk.ssm, n_frames=6,
                                    sigma_scale=sigma, seed=7)
    state = trk.initialize(frames[0], jnp.asarray(gt[0]))
    upd = jax.jit(trk.update)
    errs = []
    for t in range(1, len(frames)):
        state = upd(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(trk.corners(state)).T, gt[t]))
    assert state.extra.A.shape[0] == 3          # predictor stack
    assert max(errs) < 1.5, errs


def test_lpfc_cascade(base_image):
    """LP coarse localizer + FCLK subpixel refiner."""
    trk = create_tracker("lpfc", "ssd", "8", resx=20, resy=20,
                         lp_n_samples=400)
    lp = trk.members[0]
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    lp.ssm, n_frames=6,
                                    sigma_scale=0.012, seed=8)
    state = trk.initialize(frames[0], jnp.asarray(gt[0]))
    upd = jax.jit(trk.update)
    errs = []
    for t in range(1, len(frames)):
        state = upd(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(trk.corners(state)).T, gt[t]))
    assert max(errs) < 1.0, errs


def test_lp_identity_stays_put(base_image):
    trk = create_tracker("lp", "ssd", "2", resx=16, resy=16,
                         lp_n_samples=200)
    state = trk.initialize(base_image, jnp.asarray(CORNERS0))
    state = jax.jit(trk.update)(state, base_image)
    c = np.asarray(trk.corners(state)).T
    assert mean_corner_distance(c, CORNERS0) < 0.2
