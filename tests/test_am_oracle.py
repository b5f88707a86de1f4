"""Value-level parity tests against independent numpy oracles.

The reference never unit-tests its AM values (SURVEY.md §4: no test
suite); these tests pin MI / CCRE / NCC similarity VALUES to from-scratch
numpy implementations of the published formulas, written directly from
the math (not from mtf_tpu code paths), so a silent reformulation of the
jax side cannot pass. CCRE follows `AM/src/CCRE.cc:160-414` semantics:
survival-oriented cumulative B-spline weights on the current axis,
Parzen density weights on the template axis, pre-seeded histograms
normalized by 1/(N + n_bins^2 * pre_seed).
"""
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am

RES = 12
N_BINS = 8
PRE = 1.0


def _patches(seed=0):
    rng = np.random.default_rng(seed)
    I0 = rng.uniform(10, 245, (RES * RES, 1)).astype(np.float32)
    It = np.clip(I0 + rng.normal(0, 12, I0.shape), 0, 255).astype(np.float32)
    return I0, It


# ----- numpy oracles (independent of mtf_tpu.ops.hist) -----------------

def np_bspl3(t):
    a = np.abs(t)
    return np.where(a <= 1, (4 - 6 * a ** 2 + 3 * a ** 3) / 6,
                    np.where(a < 2, (2 - a) ** 3 / 6, 0.0))


def np_cum_bspl3_surv(x):
    """Reference cumBSpl3 (histUtils.h:46-64): 1 for x<=-2 -> 0 for x>=2."""
    x = np.asarray(x, np.float64)
    out = np.zeros_like(x)
    out[x <= -2] = 1.0
    m = (x > -2) & (x <= -1)
    out[m] = 1.0 - (2 + x[m]) ** 4 / 24.0
    m = (x > -1) & (x <= 0)
    out[m] = 0.5 + x[m] * (x[m] ** 2 * (1.0 / 3 + x[m] / 8) - 2.0 / 3)
    m = (x > 0) & (x <= 1)
    out[m] = 0.5 + x[m] * (x[m] ** 2 * (1.0 / 3 - x[m] / 8) - 2.0 / 3)
    m = (x > 1) & (x < 2)
    out[m] = (2 - x[m]) ** 4 / 24.0
    return out


def to_bins(p, margin=1.0):
    lo, hi = margin, N_BINS - 1.0 - margin
    return p / 255.0 * (hi - lo) + lo


def oracle_mi(I0, It, margin=PRE):
    z0, zt = to_bins(I0[:, 0], margin), to_bins(It[:, 0], margin)
    bins = np.arange(N_BINS)
    w0 = np_bspl3(z0[:, None] - bins[None, :])    # (N, B)
    wt = np_bspl3(zt[:, None] - bins[None, :])
    j = w0.T @ wt
    j = j / j.sum()
    p0, pt = j.sum(1), j.sum(0)
    eps = 1e-8
    return float(np.sum(j * (np.log(j + eps)
                             - np.log(p0[:, None] * pt[None, :] + eps))))


def oracle_ccre(I0, It, pre=PRE):
    """Wang-Vemuri CCRE exactly as CCRE.cc computes it."""
    z0, zt = to_bins(I0[:, 0]), to_bins(It[:, 0])
    n = z0.shape[0]
    bins = np.arange(N_BINS)
    w0 = np_bspl3(bins[None, :] - z0[:, None])          # (N, B) density
    wc = np_cum_bspl3_surv(bins[None, :] - zt[:, None])  # (N, B) survival
    hist_pre = N_BINS * pre
    norm = 1.0 / (n + hist_pre * N_BINS)                 # CCRE.cc:112
    joint = (wc.T @ w0 + pre) * norm                     # (B_cum, B_init)
    cum_h = (wc.sum(0) + hist_pre) * norm
    init_h = (w0.sum(0) + hist_pre) * norm
    return float(np.sum(joint * (np.log(joint) - np.log(cum_h)[:, None]
                                 - np.log(init_h)[None, :])))


def oracle_ncc(I0, It):
    a = I0[:, 0] - I0[:, 0].mean()
    b = It[:, 0] - It[:, 0].mean()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


# ----- parity ------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ccre_matches_oracle(seed):
    I0, It = _patches(seed)
    am = get_am("ccre", AMParams(resx=RES, resy=RES, n_bins=N_BINS,
                                 pre_seed=PRE))
    st = am.init(I0)
    got = float(am.f(st, It))
    want = oracle_ccre(I0, It)
    assert got == pytest.approx(want, rel=1e-4), (got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mi_matches_oracle(seed):
    I0, It = _patches(seed)
    am = get_am("mi", AMParams(resx=RES, resy=RES, n_bins=N_BINS,
                               pre_seed=PRE))
    st = am.init(I0)
    got = float(am.f(st, It))
    want = oracle_mi(I0, It)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5), (got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ncc_matches_oracle(seed):
    I0, It = _patches(seed)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    st = am.init(I0)
    got = float(am.f(st, It))
    want = oracle_ncc(I0, It)
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6), (got, want)


def test_ccre_asymmetric_axes():
    """CCRE is NOT symmetric (unlike MI): cumulative axis = current image.
    Guards against silently collapsing back to an MI-like symmetric form."""
    I0, It = _patches(3)
    am = get_am("ccre", AMParams(resx=RES, resy=RES, n_bins=N_BINS,
                                 pre_seed=PRE))
    f_fwd = float(am.f(am.init(I0), It))
    f_rev = float(am.f(am.init(It), I0))
    assert abs(f_fwd - f_rev) > 1e-6


def test_ccre_max_at_match_and_discriminative():
    I0, It = _patches(4)
    am = get_am("ccre", AMParams(resx=RES, resy=RES, n_bins=N_BINS,
                                 pre_seed=PRE))
    st = am.init(I0)
    assert float(am.f(st, I0)) > float(am.f(st, It))
