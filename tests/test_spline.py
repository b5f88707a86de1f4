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
