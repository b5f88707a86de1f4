import jax.numpy as jnp
import numpy as np

from mtf_tpu.ops import warp


def test_homogenize_roundtrip():
    pts = jnp.array([[1.0, 2.0], [3.0, -4.0]])
    np.testing.assert_allclose(warp.dehomogenize(warp.homogenize(pts)), pts)


def test_apply_warp_translation():
    W = jnp.eye(3).at[0, 2].set(5.0).at[1, 2].set(-2.0)
    pts = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    out = warp.apply_warp(W, pts)
    np.testing.assert_allclose(out, pts + jnp.array([5.0, -2.0]))


def test_homography_dlt_recovers_known(rng):
    H = np.array([[1.1, 0.05, 3.0], [-0.02, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(-50, 50, size=(12, 2)).astype(np.float32)
    dst = np.asarray(warp.apply_warp(jnp.asarray(H, jnp.float32), jnp.asarray(src)))
    Hest = np.asarray(warp.homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Hest, H, rtol=0, atol=2e-3)


def test_homography_dlt_weighted_ignores_outliers(rng):
    H = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, -5.0], [0.0, 0.0, 1.0]])
    src = rng.uniform(-50, 50, size=(20, 2)).astype(np.float32)
    dst = src + np.array([10.0, -5.0], np.float32)
    dst[:3] += 40.0  # outliers
    w = np.ones(20, np.float32)
    w[:3] = 0.0
    Hest = np.asarray(
        warp.homography_dlt(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(Hest, H, atol=1e-3)


def test_affine_similitude_dlt(rng):
    A = np.array([[1.2, 0.1, 4.0], [-0.1, 0.9, 2.0], [0.0, 0.0, 1.0]])
    src = rng.uniform(-10, 10, size=(8, 2)).astype(np.float32)
    dst = np.asarray(warp.apply_warp(jnp.asarray(A, jnp.float32), jnp.asarray(src)))
    Aest = np.asarray(warp.affine_dlt(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Aest, A, atol=1e-4)

    S = np.array([[1.1, -0.2, 1.0], [0.2, 1.1, -3.0], [0.0, 0.0, 1.0]])
    dst2 = np.asarray(warp.apply_warp(jnp.asarray(S, jnp.float32), jnp.asarray(src)))
    Sest = np.asarray(warp.similitude_dlt(jnp.asarray(src), jnp.asarray(dst2)))
    np.testing.assert_allclose(Sest, S, atol=1e-4)


def test_grid_from_corners_axis_aligned():
    corners = jnp.array([[10.0, 20.0], [40.0, 20.0], [40.0, 50.0], [10.0, 50.0]])
    grid = warp.grid_from_corners(corners, 4, 3)
    assert grid.shape == (12, 2)
    np.testing.assert_allclose(grid[0], [10.0, 20.0], atol=1e-3)
    np.testing.assert_allclose(grid[3], [40.0, 20.0], atol=1e-3)
    np.testing.assert_allclose(grid[-1], [40.0, 50.0], atol=1e-3)
    # uniform spacing in x along first row
    np.testing.assert_allclose(np.diff(np.asarray(grid[:4, 0])), 10.0, atol=1e-3)
