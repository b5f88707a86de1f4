"""Particle filter + nearest-neighbour SM tests on synthetic sequences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am
from mtf_tpu.sm.core import SMParams, image_corners
from mtf_tpu.sm.nn import NN, NNParams
from mtf_tpu.sm.pf import PF, PFParams
from mtf_tpu.ssm import get_ssm
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

RES = 20
CORNERS0 = np.array([[50.0, 40.0], [110.0, 40.0], [110.0, 95.0], [50.0, 95.0]],
                    np.float32)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((160, 200)), 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


def run(sm, frames, gt):
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(image_corners(sm.ssm, state)), gt[t]))
    return errs, state


@pytest.mark.parametrize("mean_type", ["weighted", "corner", "best"])
def test_pf_translation(base_image, mean_type):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=11)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    sm = PF(am, get_ssm("trans"),
            pf=PFParams(n_particles=400, pix_sigma=4.0, mean_type=mean_type,
                        likelihood="gaussian", measurement_sigma=0.05))
    errs, state = run(sm, frames, gt)
    assert max(errs) < 3.0, f"{mean_type}: errors {errs}"
    # particles kept, weights normalized
    w = np.exp(np.asarray(state.extra.log_weights))
    assert abs(w.sum() - 1.0) < 1e-3


def test_pf_ar1_similitude(base_image):
    ssm = get_ssm("sim")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.015, seed=12)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    sm = PF(am, get_ssm("sim"),
            pf=PFParams(n_particles=600, pix_sigma=3.0, dynamic_model="ar1",
                        likelihood="gaussian", measurement_sigma=0.05))
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 4.0, f"errors {errs}"


def test_nn_translation(base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=13)
    am = get_am("zncc", AMParams(resx=RES, resy=RES))
    sm = NN(am, get_ssm("trans"), nn=NNParams(n_samples=800, pix_sigma=6.0,
                                              max_iters=4))
    errs, state = run(sm, frames, gt)
    assert state.extra.feats.shape[0] == 800
    assert max(errs) < 3.0, f"errors {errs}"


def test_nn_identity_sample_keeps_match(base_image):
    # frame identical to init: NN must keep the region in place via the
    # identity sample at index 0
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = NN(am, get_ssm("trans"), nn=NNParams(n_samples=200, pix_sigma=5.0,
                                              max_iters=2))
    state = sm.initialize(base_image, jnp.asarray(CORNERS0))
    state2 = jax.jit(sm.update)(state, base_image)
    c = np.asarray(image_corners(sm.ssm, state2))
    assert mean_corner_distance(c, CORNERS0) < 0.5
