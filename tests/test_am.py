"""AM unit tests — the jax analog of the reference's derivative Diagnostics
(SURVEY.md §4.1): analytic (AD) gradients vs finite differences, similarity
maxima at perfect match, Hessian contractions, ILM recovery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import (AM_REGISTRY, AMParams, get_am, gn_hessian,
                        jacobian, self_hessian)
from mtf_tpu.am.misc import SumOfAMs

RES = 10  # small patches for speed
PRM = AMParams(resx=RES, resy=RES)

# AMs whose f is smooth enough for FD gradient checks. The SCV family is
# excluded: its gradient deliberately treats the data-dependent intensity
# remap as constant (stop_gradient), matching the reference's approximation
# (SCV.cc mapped_gradient), so exact FD disagrees by design.
GRAD_AMS = ["ssd", "nssd", "zncc", "ncc", "ssim", "spss", "mi", "ccre",
            "kld", "lkld", "riu", "ngf", "pca"]
ALL_AMS = list(AM_REGISTRY)


def make_patches(rng, n_channels=1):
    base = rng.uniform(30, 220, (RES * RES, n_channels)).astype(np.float32)
    pert = base + rng.normal(0, 8, base.shape).astype(np.float32)
    return jnp.asarray(base), jnp.asarray(np.clip(pert, 0, 255))


@pytest.mark.parametrize("key", ALL_AMS)
def test_similarity_max_at_match(key, rng):
    am = get_am(key, PRM)
    I0, It = make_patches(rng)
    st = am.init(I0)
    f_match = float(am.f(st, I0))
    f_off = float(am.f(st, It))
    assert np.isfinite(f_match) and np.isfinite(f_off)
    assert f_match >= f_off - 1e-4, f"{key}: f(I0)={f_match} < f(It)={f_off}"


@pytest.mark.parametrize("key", GRAD_AMS)
def test_grad_matches_fd(key, rng):
    am = get_am(key, PRM)
    I0, It = make_patches(rng)
    st = am.init(I0)
    g = np.asarray(am.grad(st, It)).reshape(-1)
    # FD along random directions (f64 via numpy for stability)
    f = lambda p: float(am.f(st, jnp.asarray(p, jnp.float32)))
    rng2 = np.random.default_rng(1)
    It_np = np.asarray(It, np.float64)
    for _ in range(3):
        v = rng2.standard_normal(It_np.shape)
        h = 1e-2
        fd = (f(It_np + h * v) - f(It_np - h * v)) / (2 * h)
        an = float(g @ v.reshape(-1))
        scale = max(abs(fd), abs(an), 1e-3)
        assert abs(fd - an) / scale < 0.05, f"{key}: fd={fd} vs ad={an}"


@pytest.mark.parametrize("key", ["ssd", "ncc", "zncc", "mi", "ssim"])
def test_hessian_contractions(key, rng):
    am = get_am(key, PRM)
    I0, It = make_patches(rng)
    st = am.init(I0)
    S = 4
    J = jnp.asarray(rng.normal(0, 1, (RES * RES, S)), jnp.float32)
    H_self = np.asarray(self_hessian(am, It, st.p_am, J))
    H_gn = np.asarray(gn_hessian(am, st, It, J))
    assert H_self.shape == (S, S) and H_gn.shape == (S, S)
    np.testing.assert_allclose(H_self, H_self.T, atol=1e-2 * np.abs(H_self).max())
    # self-Hessian at a perfect match must be negative semi-definite
    w = np.linalg.eigvalsh(0.5 * (H_self + H_self.T))
    assert w.max() <= 1e-3 * max(1.0, abs(w.min())), f"{key}: eig {w}"
    j = np.asarray(jacobian(am, st, It, J))
    assert j.shape == (S,)


def test_ssd_gn_hessian_closed_form(rng):
    am = get_am("ssd", PRM)
    I0, It = make_patches(rng)
    st = am.init(I0)
    J = jnp.asarray(rng.normal(0, 1, (RES * RES, 3)), jnp.float32)
    H = np.asarray(gn_hessian(am, st, It, J))
    np.testing.assert_allclose(H, -np.asarray(J).T @ np.asarray(J), rtol=1e-4)


def test_scv_invariant_to_monotone_remap(rng):
    """SCV's raison d'etre (reference SCV.cc): robustness to global
    monotone intensity changes."""
    scv = get_am("scv", PRM)
    ssd = get_am("ssd", PRM)
    I0, _ = make_patches(rng)
    # nonlinear monotone intensity map of the template
    It = 255.0 * (jnp.asarray(I0) / 255.0) ** 0.6
    st_scv, st_ssd = scv.init(I0), ssd.init(I0)
    n = I0.size
    rms_scv = np.sqrt(-2 * float(scv.f(st_scv, It)) / n)
    rms_ssd = np.sqrt(-2 * float(ssd.f(st_ssd, It)) / n) / 255.0 * (
        PRM.n_bins - 1 - 2 * PRM.pre_seed)  # same bin-coordinate units
    assert rms_scv < 0.35 * rms_ssd, (rms_scv, rms_ssd)


def test_zncc_invariant_to_gain_bias(rng):
    am = get_am("zncc", PRM)
    I0, _ = make_patches(rng)
    st = am.init(I0)
    f_same = float(am.f(st, I0))
    f_gb = float(am.f(st, 1.7 * I0 + 31.0))
    assert abs(f_same - f_gb) < 1e-2


def test_mi_prefers_aligned(rng, test_image):
    from mtf_tpu.ops import interp, warp
    am = get_am("mi", PRM)
    img = jnp.asarray(test_image)
    corners = jnp.array([[40.0, 30.0], [90.0, 30.0], [90.0, 80.0], [40.0, 80.0]])
    grid = warp.grid_from_corners(corners, RES, RES)
    I0 = interp.sample(img, grid)
    st = am.init(I0)
    f_aligned = float(am.f(st, interp.sample(img, grid)))
    f_shifted = float(am.f(st, interp.sample(img, grid + 5.0)))
    assert f_aligned > f_shifted


def test_ilm_gb_compensates_gain_bias(rng):
    am = get_am("ssd", PRM, ilm="gb")
    I0, _ = make_patches(rng)
    st = am.init(I0)
    It = 1.3 * I0 + 12.0
    # with identity p_am the residual is large
    f0 = float(am.f(st, It))
    # with the compensating params (1+a) * (1.3 I0 + 12) + b == I0
    a = 1.0 / 1.3 - 1.0
    b = -12.0 / 1.3
    f1 = float(am.f_with_pam(st, It, jnp.array([a, b])))
    assert f1 > f0 and f1 > -1e-2


def test_ilm_pgb_rbf_identity(rng):
    for key in ["pgb", "rbf"]:
        am = get_am("ssd", PRM, ilm=key)
        I0, It = make_patches(rng)
        st = am.init(I0)
        np.testing.assert_allclose(
            np.asarray(am.ilm.apply(It, st.p_am)), np.asarray(It), rtol=1e-6)


def test_pca_learns_basis(rng):
    am = get_am("pca", AMParams(resx=RES, resy=RES,
                                extra={"n_eigenvec": 4, "batch_size": 6}))
    I0, _ = make_patches(rng)
    st = am.init(I0)
    for _ in range(6):
        It = I0 + jnp.asarray(rng.normal(0, 5, I0.shape), jnp.float32)
        st = am.update_model(st, It)
    basis = st.extra[1]
    assert float(jnp.linalg.norm(basis)) > 0.5  # basis populated after batch


def test_sum_of_ams(rng):
    am = SumOfAMs(get_am("ssd", PRM), get_am("ncc", PRM))
    I0, It = make_patches(rng)
    st = am.init(I0)
    assert np.isfinite(float(am.f(st, It)))
    assert float(am.f(st, I0)) >= float(am.f(st, It))
    g = am.grad(st, It)
    assert g.shape == It.shape


def test_multichannel_aliases(rng):
    am = get_am("mcssd")
    assert am.prm.n_channels == 3
    am2 = get_am("ncc3")
    assert am2.prm.n_channels == 3
    I0, It = make_patches(rng, 3)
    prm3 = AMParams(resx=RES, resy=RES, n_channels=3)
    for key in ["ssd", "ncc", "mi", "ssim"]:
        a = get_am(key, prm3)
        st = a.init(I0)
        assert float(a.f(st, I0)) >= float(a.f(st, It)) - 1e-4


def test_likelihoods_positive(rng):
    I0, It = make_patches(rng)
    for key in GRAD_AMS:
        am = get_am(key, PRM)
        st = am.init(I0)
        lik = float(am.likelihood(st, It))
        assert np.isfinite(lik) and lik >= 0.0, key
        assert float(am.likelihood(st, I0)) >= lik - 1e-6, key
