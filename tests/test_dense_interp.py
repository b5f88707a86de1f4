"""Dense (matmul-form) interpolation: the TPU gather replacement.

Validates exact agreement with the gather sampler and end-to-end LK
tracking through the dense path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.ops import interp
from mtf_tpu.utils import synth


@pytest.fixture(scope="module")
def img_pts():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (240, 320)), jnp.float32)
    pts = jnp.asarray(rng.uniform(60, 170, (400, 2)), jnp.float32)
    return img, pts


@pytest.mark.parametrize("kind", ["linear", "cubic", "cubic_bspl"])
def test_dense_matches_gather(img_pts, kind):
    img, pts = img_pts
    v1, g1 = interp.sample_with_grad(img, pts, kind)
    v2, g2 = interp.sample_dense(img, pts, kind)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_dense_crop_matches(img_pts, kind):
    img, pts = img_pts
    v1, g1 = interp.sample_with_grad(img, pts, kind)
    v2, g2 = interp.sample_dense(img, pts, kind, crop=128)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_mm_kind_via_sample(img_pts):
    img, pts = img_pts
    v = interp.sample(img, pts, "linear_mm")
    np.testing.assert_allclose(np.asarray(v),
                               np.asarray(interp.sample(img, pts, "linear")),
                               atol=1e-3)


@pytest.mark.parametrize("kind", ["linear", "cubic", "cubic_bspl"])
def test_pallas_kernel_matches(img_pts, kind):
    from mtf_tpu.ops.pallas import sample_dense_pallas
    img, pts = img_pts
    v1, g1 = interp.sample_with_grad(img, pts, kind)
    # f32 dots: exact parity with the gather path
    v2, g2 = sample_dense_pallas(img, pts, kind, crop=128, interpret=True,
                                 dot_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)
    # bf16 dots (the TPU default): bounded by weight/image quantization
    # (~2^-8 relative; ~1 intensity level on 0-255 imagery)
    scale = float(np.abs(np.asarray(img)).max())
    v3, g3 = sample_dense_pallas(img, pts, kind, crop=128, interpret=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v3),
                               atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g3),
                               atol=3e-2 * scale)


def test_lk_tracks_through_pallas_path(test_image):
    corners = jnp.asarray([[40, 40], [104, 40], [104, 104], [40, 104]],
                          jnp.float32)
    Wm = jnp.array([[1, 0, 1.5], [0, 1, -1.0], [0, 0, 1]], jnp.float32)
    frame1 = synth.warp_image(jnp.asarray(test_image), Wm)
    exp = np.asarray(corners) + np.array([1.5, -1.0], np.float32)
    sm = create_tracker("fclk", "ssd", "8", resx=32, resy=32, max_iters=30,
                        interp="linear_mm", crop=128, use_pallas=True)
    st = sm.initialize(jnp.asarray(test_image), corners)
    st = sm.update(st, frame1)
    err = np.linalg.norm(np.asarray(sm.corners(st)).T - exp, axis=-1).mean()
    assert err < 0.3, err


def test_lk_tracks_through_dense_path(test_image):
    corners = jnp.asarray([[40, 40], [104, 40], [104, 104], [40, 104]],
                          jnp.float32)
    Wm = jnp.array([[1, 0, 1.5], [0, 1, -1.0], [0, 0, 1]], jnp.float32)
    frame1 = synth.warp_image(jnp.asarray(test_image), Wm)
    exp = np.asarray(corners) + np.array([1.5, -1.0], np.float32)
    for kw in (dict(interp="linear_mm"), dict(interp="linear_mm", crop=128),
               dict(interp="cubic_mm", crop=128)):
        sm = create_tracker("fclk", "ssd", "8", resx=32, resy=32,
                            max_iters=30, **kw)
        st = sm.initialize(jnp.asarray(test_image), corners)
        st = sm.update(st, frame1)
        err = np.linalg.norm(np.asarray(sm.corners(st)).T - exp,
                             axis=-1).mean()
        assert err < 0.3, (kw, err)


def test_blocked_dense_matches(img_pts):
    """Tiled dense sampling == monolithic dense sampling (per-tile crop)."""
    import jax.numpy as jnp

    from mtf_tpu.ops import interp
    from mtf_tpu.ops import warp as W

    img, _ = img_pts
    corners = jnp.asarray([[20.3, 15.7], [80.9, 17.2], [83.1, 70.8],
                           [18.2, 68.9]], jnp.float32)
    pts = W.grid_from_corners(corners, 20, 20)
    v0, g0 = interp.sample_dense(img, pts, "linear")
    v1, g1 = interp.sample_dense_blocked(img, pts, "linear", crop=48,
                                         grid_shape=(20, 20), blocks=(2, 2))
    assert float(jnp.max(jnp.abs(v0 - v1))) < 1e-4
    assert float(jnp.max(jnp.abs(g0 - g1))) < 1e-4
