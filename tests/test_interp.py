import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.ops import interp


@pytest.fixture
def pts(rng):
    x = rng.uniform(5, 150, size=32).astype(np.float32)
    y = rng.uniform(5, 120, size=32).astype(np.float32)
    return jnp.stack([jnp.asarray(x), jnp.asarray(y)], axis=-1)


def test_bilinear_matches_manual(test_image, pts):
    out = np.asarray(interp.sample(jnp.asarray(test_image), pts))[:, 0]
    img = test_image
    for k in range(pts.shape[0]):
        x, y = float(pts[k, 0]), float(pts[k, 1])
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        ref = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
               + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
        np.testing.assert_allclose(out[k], ref, rtol=1e-5)


def test_integer_points_exact(test_image):
    pts = jnp.array([[3.0, 7.0], [100.0, 50.0]])
    for kind in [interp.NEAREST, interp.LINEAR, interp.CUBIC]:
        out = np.asarray(interp.sample(jnp.asarray(test_image), pts, kind))[:, 0]
        np.testing.assert_allclose(
            out, [test_image[7, 3], test_image[50, 100]], rtol=1e-5)


def test_cubic_bspl_smooths(test_image):
    # B-spline is approximating: integer points not exactly interpolated,
    # but close for a smooth image.
    pts = jnp.array([[30.0, 40.0]])
    out = float(interp.sample(jnp.asarray(test_image), pts, interp.CUBIC_BSPL)[0, 0])
    assert abs(out - test_image[40, 30]) < 2.0


def test_constant_border(test_image):
    pts = jnp.array([[-10.0, -10.0], [5000.0, 5000.0]])
    out = interp.sample(jnp.asarray(test_image), pts, interp.LINEAR,
                        interp.CONSTANT, cval=7.0)
    np.testing.assert_allclose(np.asarray(out), 7.0)


def test_replicate_border(test_image):
    pts = jnp.array([[-10.0, 7.0]])
    out = float(interp.sample(jnp.asarray(test_image), pts)[0, 0])
    np.testing.assert_allclose(out, test_image[7, 0], rtol=1e-5)


@pytest.mark.parametrize("kind", [interp.LINEAR, interp.CUBIC, interp.CUBIC_BSPL])
def test_analytic_grad_vs_fd(test_image, pts, kind):
    img = jnp.asarray(test_image) / 255.0  # unit range: tame f32 cancellation
    # keep points in cell interiors: bilinear's derivative is discontinuous
    # at integer coordinates, so an FD straddling a cell edge disagrees
    pts = jnp.floor(pts) + 0.3 + 0.4 * (pts - jnp.floor(pts))
    g_an = np.asarray(interp.sample_grad(img, pts, kind))
    eps = 0.02  # stays within one cell for all test points
    g_fd = np.asarray(interp.sample_grad_fd(img, pts, eps=eps, kind=kind))
    np.testing.assert_allclose(g_an, g_fd, atol=2e-3)


@pytest.mark.parametrize("kind", [interp.LINEAR, interp.CUBIC])
def test_custom_jvp_pts(test_image, pts, kind):
    img = jnp.asarray(test_image)

    def f(p):
        return jnp.sum(interp.sample(img, p, kind) ** 2)

    # directional derivative via custom JVP vs central finite difference
    v = jnp.asarray(np.random.default_rng(1).standard_normal(pts.shape), jnp.float32)
    _, jv = jax.jvp(f, (pts,), (v,))
    h = 1e-3
    fd = (f(pts + h * v) - f(pts - h * v)) / (2 * h)
    np.testing.assert_allclose(float(jv), float(fd), rtol=5e-2, atol=1e-1)


def test_grad_wrt_image(test_image, pts):
    img = jnp.asarray(test_image)

    def f(im):
        return jnp.sum(interp.sample(im, pts))

    g = jax.grad(f)(img)
    # gradient wrt image sums interpolation weights -> total = n_pts
    np.testing.assert_allclose(float(jnp.sum(g)), pts.shape[0], rtol=1e-5)


def test_hess_fd_on_quadratic():
    # image = x^2 + 3*y^2 + x*y -> hess [[2,1],[1,6]] (cubic interp is exact
    # for quadratics away from borders)
    H, W = 64, 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = jnp.asarray(xx ** 2 + 3 * yy ** 2 + xx * yy)
    pts = jnp.array([[30.3, 25.7]])
    hess = np.asarray(interp.sample_hess_fd(img, pts, eps=1.0, kind=interp.CUBIC))[0, 0]
    np.testing.assert_allclose(hess, [[2.0, 1.0], [1.0, 6.0]], atol=1e-2)


def test_multichannel(test_image, pts):
    img3 = jnp.stack([jnp.asarray(test_image)] * 3, axis=-1)
    out = interp.sample(img3, pts)
    assert out.shape == (pts.shape[0], 3)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 2]))
