"""LK search-method integration tests: known-warp recovery on synthetic
sequences (the reference's synthetic-GT test mechanism, SURVEY.md §4.2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am
from mtf_tpu.sm.core import SMParams
from mtf_tpu.sm.lk import SM_LK_REGISTRY, FCLK, ICLK, ESM
from mtf_tpu.ssm import get_ssm
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

RES = 20
CORNERS0 = np.array([[50.0, 40.0], [110.0, 40.0], [110.0, 95.0], [50.0, 95.0]],
                    np.float32)


def run_tracker(sm, frames, gt, n_frames=None):
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    n = n_frames or len(frames)
    for t in range(1, n):
        state = update(state, frames[t])
        from mtf_tpu.sm.core import image_corners
        c = np.asarray(image_corners(sm.ssm, state))
        errs.append(mean_corner_distance(c, gt[t]))
    return errs


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((160, 200)), 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


@pytest.mark.parametrize("sm_key", ["fclk", "iclk", "esm", "falk", "ialk"])
def test_lk_translation_recovery(sm_key, base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.04, seed=1)
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = SM_LK_REGISTRY[sm_key](am, get_ssm("trans"),
                                SMParams(max_iters=30, epsilon=0.005))
    errs = run_tracker(sm, frames, gt)
    assert max(errs) < 0.5, f"{sm_key}: errors {errs}"


@pytest.mark.parametrize("am_key", ["ssd", "ncc", "zncc", "ssim", "spss",
                                    "scv", "rscv", "mi"])
def test_fclk_am_sweep_similitude(am_key, base_image):
    ssm_gen = get_ssm("sim")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.02,
                                    seed=2)
    am = get_am(am_key, AMParams(resx=RES, resy=RES))
    sm = FCLK(am, get_ssm("sim"), SMParams(max_iters=40, epsilon=0.005,
                                           hess_type="selft"))
    errs = run_tracker(sm, frames, gt)
    tol = 2.0 if am_key == "mi" else 1.0
    assert max(errs) < tol, f"{am_key}: errors {errs}"


def test_esm_homography_recovery(base_image):
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=6, sigma_scale=0.015,
                                    seed=3)
    am = get_am("ncc", AMParams(resx=30, resy=30))
    sm = ESM(am, get_ssm("hom"), SMParams(max_iters=40, epsilon=0.003,
                                          hess_type="selft"))
    errs = run_tracker(sm, frames, gt)
    assert max(errs) < 1.0, f"errors {errs}"


def test_iclk_uses_cached_jacobian(base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=3, sigma_scale=0.03, seed=4)
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = ICLK(am, get_ssm("trans"), SMParams(max_iters=30))
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    assert state.extra.J0.shape == (RES * RES, 2)
    assert state.extra.H0.shape == (2, 2)
    # H0 must be negative definite for SSD
    w = np.linalg.eigvalsh(np.asarray(state.extra.H0))
    assert w.max() < 0


def test_lm_damping_runs(base_image):
    ssm = get_ssm("aff")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=4, sigma_scale=0.02, seed=5)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    sm = ESM(am, get_ssm("aff"), SMParams(max_iters=30, enable_lm=True,
                                          hess_type="selft"))
    errs = run_tracker(sm, frames, gt)
    assert max(errs) < 1.5, f"errors {errs}"


def test_ilm_gb_tracks_under_illumination_drift(base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=5, sigma_scale=0.03, seed=6,
                                    gain_drift=0.06, bias_drift=6.0)
    am = get_am("ssd", AMParams(resx=RES, resy=RES), ilm="gb")
    sm = FCLK(am, get_ssm("trans"), SMParams(max_iters=40, epsilon=0.005,
                                             hess_type="selft"))
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        from mtf_tpu.sm.core import image_corners
        errs.append(mean_corner_distance(
            np.asarray(image_corners(sm.ssm, state)), gt[t]))
    assert max(errs) < 1.0, f"errors {errs}"
    # photometric params should have moved toward compensating the drift
    assert abs(float(state.am_state.p_am[0])) > 1e-3


def test_std2_full_newton_hessian(base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=3, sigma_scale=0.02, seed=7)
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = FCLK(am, get_ssm("trans"),
              SMParams(max_iters=30, hess_type="std2", interp="cubic"))
    errs = run_tracker(sm, frames, gt)
    assert max(errs) < 0.5, f"errors {errs}"


def test_set_region(base_image):
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = FCLK(am, get_ssm("hom"))
    state = sm.initialize(base_image, jnp.asarray(CORNERS0))
    new_corners = jnp.asarray(CORNERS0 + np.array([5.0, -3.0], np.float32))
    state2 = sm.set_region(state, new_corners)
    from mtf_tpu.sm.core import image_corners
    np.testing.assert_allclose(np.asarray(image_corners(sm.ssm, state2)),
                               np.asarray(new_corners), atol=1e-2)
