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


@pytest.mark.parametrize("kind", ["linear", "cubic"])
@pytest.mark.parametrize("blur", [2, 4])
def test_blurred_tap_weights_match_blurred_image(img_pts, kind, blur):
    """dense_sample._weights_dense(blur=k) == plain taps on the
    binomially blurred image (convolution commutes) — the identity the
    chain kernel's blurred-tap mode relies on."""
    from mtf_tpu.ops.pallas.dense_sample import _binomial_taps, \
        _weights_dense
    from mtf_tpu.sm.lk import LKBase

    img, pts = img_pts
    interior = pts[(np.asarray(pts)[:, 0] > 12)
                   & (np.asarray(pts)[:, 0] < 115)
                   & (np.asarray(pts)[:, 1] > 12)
                   & (np.asarray(pts)[:, 1] < 115)]
    t = jnp.arange(-8.0, 8.01, 0.37)
    wb, _ = _weights_dense(t, kind, blur)
    taps = _binomial_taps(blur)
    r = (len(taps) - 1) // 2
    ref = sum(float(c) * np.asarray(_weights_dense(t - (i - r), kind)[0])
              for i, c in enumerate(taps))
    np.testing.assert_allclose(np.asarray(wb), ref, atol=1e-5)
    # end-to-end: blurred-tap sampling of the raw image == plain
    # sampling of the blurred image (away from borders)
    blurred = LKBase._blur2(img, blur)
    v_plain = interp.sample(blurred, interior, "linear")
    kx = jnp.arange(img.shape[1], dtype=jnp.float32)
    ky = jnp.arange(img.shape[0], dtype=jnp.float32)
    wx, _ = _weights_dense(kx[None, :] - interior[:, :1], "linear", blur)
    wy, _ = _weights_dense(ky[None, :] - interior[:, 1:2], "linear", blur)
    v_taps = jnp.einsum("nh,hw,nw->n", wy, img, wx)
    np.testing.assert_allclose(np.asarray(v_taps),
                               np.asarray(v_plain)[:, 0], atol=0.15)


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


@pytest.mark.parametrize("n_pts", [1024, 4500])
def test_lk_fused_chain_matches_jvp_jacobian(n_pts):
    """Chain-fused kernel (in-VMEM point projection + quotient-rule warp
    Jacobian) == explicit jvp-built (2S, N) Jacobian fed to the
    transposed kernel. 4500 pts exercises the tiled + masked-pad path."""
    import jax
    from mtf_tpu.ops.pallas.lk_fused import lk_fused_chain, lk_fused_gn_t
    from mtf_tpu.ssm import get_ssm

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (128, 128)), jnp.float32)
    ssm = get_ssm("8")
    S = ssm.dof
    state = jnp.asarray(rng.normal(0, 0.02, S), jnp.float32)
    # base points in a normalized-ish frame; M0 maps them into the window
    side = int(np.sqrt(n_pts))
    g = np.stack(np.meshgrid(np.linspace(-0.5, 0.5, side),
                             np.linspace(-0.5, 0.5, side)), -1).reshape(-1, 2)
    g = np.concatenate([g, rng.uniform(-0.5, 0.5, (n_pts - side * side, 2))])
    ph = jnp.asarray(np.concatenate([g.T, np.ones((1, n_pts))]), jnp.float32)
    norm = jnp.asarray([[60.0, 0, 64], [0, 60.0, 64], [0, 0, 1]], jnp.float32)
    M0 = norm @ ssm.to_matrix(state)
    templ = jnp.asarray(rng.uniform(0, 255, n_pts), jnp.float32)

    def ptsT_of(dp):
        q = (M0 @ ssm.to_matrix(dp)) @ ph
        return q[:2] / q[2:3]

    zero = jnp.zeros((S,), jnp.float32)
    ptsT = ptsT_of(zero)
    rows_x, rows_y = [], []
    for s in range(S):
        _, c = jax.jvp(ptsT_of, (zero,), (jnp.eye(S, dtype=jnp.float32)[s],))
        rows_x.append(c[0])
        rows_y.append(c[1])
    jacT = jnp.concatenate([jnp.stack(rows_x), jnp.stack(rows_y)])

    v1, g1, h1 = lk_fused_gn_t(img, ptsT, jacT, templ, interpret=True)
    v2, g2, h2 = lk_fused_chain(img, M0, ssm.generators, ph, templ,
                                interpret=True)
    # positions are computed in different (equivalent) association orders;
    # last-ulp coordinate rounding moves linear-tap weights by ~1e-6,
    # i.e. <=0.5 intensity levels on 0-255 imagery
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1.0)
    # g/h are large cancellation-heavy f32 reductions; compare against
    # the vector/matrix scale, not elementwise (reduction-order noise)
    g1, g2, h1, h2 = (np.asarray(a) for a in (g1, g2, h1, h2))
    assert np.max(np.abs(g1 - g2)) <= 1e-4 * np.linalg.norm(g1), (g1, g2)
    assert np.max(np.abs(h1 - h2)) <= 1e-4 * np.linalg.norm(h1)
