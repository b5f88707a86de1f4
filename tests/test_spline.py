"""Non-rigid SSM tests: Spline + TPS (reference SSM/src/{Spline,TPS}.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.ssm import get_ssm
from mtf_tpu.ssm.spline import Spline, TPS
from mtf_tpu.utils import synth


@pytest.mark.parametrize("key,cls", [("spline", Spline), ("spl", Spline),
                                     ("tps", TPS)])
def test_registry(key, cls):
    assert isinstance(get_ssm(key), cls)


@pytest.mark.parametrize("ssm", [Spline(), TPS()])
def test_identity_and_translation(ssm):
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.8, 0.8, (30, 2)),
                      jnp.float32)
    z = ssm.identity()
    np.testing.assert_allclose(np.asarray(ssm.warp_pts(z, pts)),
                               np.asarray(pts), atol=1e-4)
    # uniform control displacement == rigid translation of every point
    K = ssm.dof // 2
    state = jnp.tile(jnp.asarray([0.1, -0.05], jnp.float32), (K,)).reshape(
        K, 2).reshape(-1)
    out = np.asarray(ssm.warp_pts(state, pts))
    np.testing.assert_allclose(out, np.asarray(pts) + [0.1, -0.05],
                               atol=2e-3)


@pytest.mark.parametrize("ssm", [Spline(), TPS()])
def test_fit_pts_recovers_displacement(ssm):
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(-0.9, 0.9, (60, 2)), jnp.float32)
    true_state = jnp.asarray(
        0.05 * rng.standard_normal(ssm.dof), jnp.float32)
    dst = ssm.warp_pts(true_state, src)
    est = ssm.fit_pts(src, dst)
    out = np.asarray(ssm.warp_pts(est, src))
    np.testing.assert_allclose(out, np.asarray(dst), atol=2e-3)


@pytest.mark.parametrize("ssm", [Spline(3, 3), TPS(3, 3)])
def test_dwdp_matches_fd(ssm):
    pts = jnp.asarray(np.random.default_rng(2).uniform(-0.7, 0.7, (10, 2)),
                      jnp.float32)
    J = np.asarray(ssm.dwdp_identity(pts))  # (N, 2, S)
    eps = 1e-3
    for i in range(0, ssm.dof, 5):
        e = np.zeros(ssm.dof, np.float32)
        e[i] = eps
        fd = (np.asarray(ssm.warp_pts(jnp.asarray(e), pts)) -
              np.asarray(ssm.warp_pts(jnp.asarray(-e), pts))) / (2 * eps)
        np.testing.assert_allclose(J[:, :, i], fd, atol=1e-2)


def test_lk_tracks_translation_with_spline(test_image):
    """FCLK + SSD + spline recovers a rigid shift as a uniform field."""
    sm = create_tracker("fclk", "ssd", "spline", resx=20, resy=20,
                        max_iters=30)
    corners = jnp.asarray([[50, 40], [110, 40], [110, 100], [50, 100]],
                          jnp.float32)
    st = sm.initialize(jnp.asarray(test_image), corners)
    Wm = jnp.array([[1, 0, 1.5], [0, 1, -1.0], [0, 0, 1]], jnp.float32)
    frame1 = synth.warp_image(jnp.asarray(test_image), Wm)
    st = sm.update(st, frame1)
    out = np.asarray(sm.corners(st)).T
    expected = np.asarray(corners) + np.array([1.5, -1.0], np.float32)
    assert np.linalg.norm(out - expected, axis=-1).mean() < 0.5


def test_spline_influence_regions_partition_of_unity():
    """Reference initInterpolationWeights semantics (Spline.cc:186-204):
    weights truncate outside the influence span and row-normalize to 1."""
    ssm = Spline(5, 5, overlap=0.1)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (64, 2)),
                      jnp.float32)
    w = np.asarray(ssm.weights(pts))
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-5)
    # locality: each point is influenced by few controls, not all 25
    assert (w > 1e-6).sum(axis=1).max() <= 9


@pytest.mark.parametrize("interp_type", ["bilinear", "biquadratic",
                                         "bicubic"])
def test_spline_interp_types(interp_type):
    """All three InterpolationType enum values work (the reference throws
    FunctonNotImplemented for the last two, Spline.cc:230-233)."""
    ssm = Spline(4, 4, interp_type=interp_type)
    st = jnp.asarray(np.random.default_rng(1).normal(0, 0.02, (ssm.dof,)),
                     jnp.float32)
    pts = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (32, 2)),
                      jnp.float32)
    d = np.asarray(ssm.displacement(st, pts))
    assert np.all(np.isfinite(d)) and np.abs(d).max() < 0.2


def test_fclk_spline_recovers_nonrigid_warp(test_image):
    """FCLK + SSD + spline recovers a synthetic NON-RIGID warp (VERDICT
    r1 #9): the scene is bent by a smooth sinusoidal displacement field
    no projective SSM can represent."""
    import mtf_tpu
    from mtf_tpu.ops import interp as I

    img = jnp.asarray(test_image)
    h, w = img.shape[:2]
    corners = np.array([[40, 40], [120, 40], [120, 120], [40, 120]],
                       np.float32)
    # non-rigid frame: sample frame1 at x - d(x): content shifts by +d
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    amp = 2.0
    dx = amp * jnp.sin(2 * jnp.pi * (yy - 40) / 160.0)
    dy = amp * jnp.cos(2 * jnp.pi * (xx - 40) / 160.0)
    pts = jnp.stack([(xx - dx).ravel(), (yy - dy).ravel()], -1)
    frame1 = I.sample(img, pts, "linear", "replicate").reshape(img.shape)

    sm = mtf_tpu.create_tracker("fclk", "ssd", "spline", resx=24, resy=24,
                                max_iters=40)
    st = sm.initialize(img, jnp.asarray(corners))
    st = sm.update(st, frame1)
    # evaluate recovery at the template grid points, against the true field
    region = st.region
    from mtf_tpu.ops import warp as W
    pts_t = sm.ssm.warp_pts(st.ssm_state, region.base_pts)
    got = np.asarray(W.apply_warp(region.norm_mat, pts_t))
    pts0 = np.asarray(W.apply_warp(region.norm_mat, region.base_pts))
    true_dx = amp * np.sin(2 * np.pi * (pts0[:, 1] - 40) / 160.0)
    true_dy = amp * np.cos(2 * np.pi * (pts0[:, 0] - 40) / 160.0)
    expect = pts0 + np.stack([true_dx, true_dy], -1)
    err = np.linalg.norm(got - expect, axis=-1)
    base = np.linalg.norm(pts0 - expect, axis=-1)
    assert err.mean() < 0.45 * base.mean(), (err.mean(), base.mean())
