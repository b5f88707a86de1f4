"""Diagnostics sweeps: AD vs finite differences for AM x SSM pairs
(the reference's enable_validation contract, Diagnostics.cc:131-200)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am
from mtf_tpu.diagnostics import Diagnostics
from mtf_tpu.ssm import get_ssm


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
    img = (raw - raw.min()) / (raw.max() - raw.min()) * 255.0
    corners = jnp.asarray([[100, 80], [220, 80], [220, 160], [100, 160]],
                          jnp.float32)
    return jnp.asarray(img, jnp.float32), corners


# SCV-family excluded: its gradient intentionally freezes the intensity
# remap table (stop_gradient, matching the reference's treatment of the
# remap as locally constant — SCV.cc updateSimilarity), so the FD secant
# legitimately disagrees with the analytic/AD derivative.
@pytest.mark.parametrize("am_key,ssm_key", [
    ("ssd", "2"), ("ssd", "8"), ("ncc", "8"), ("zncc", "6"),
    ("ssim", "4"), ("mi", "8"), ("riu", "3"),
])
def test_ad_matches_fd(scene, am_key, ssm_key):
    img, corners = scene
    am = get_am(am_key, AMParams(resx=20, resy=20))
    rep = Diagnostics(am, get_ssm(ssm_key)).validate(img, corners)
    assert rep.ok, (f"{am_key} x {ssm_key}: jac={rep.max_jac_err:.2e} "
                    f"hess={rep.max_hess_err:.2e}")


# Only exactly-peaked AMs here. SCV's remap adapts to the displaced patch
# (flat-top surface) and MI's Parzen-histogram estimate has finite-sample
# bias of ~1e-3 nats — peak-at-zero is not a theorem for either.
@pytest.mark.parametrize("am_key", ["ncc", "ssd"])
def test_sweep_has_max_at_zero(scene, am_key):
    img, corners = scene
    am = get_am(am_key, AMParams(resx=20, resy=20))
    sweeps = Diagnostics(am, get_ssm("8")).sweep(img, corners, span=0.05)
    for d, (xs, ys) in sweeps.items():
        assert np.argmax(ys) == len(xs) // 2, f"dim {d} peak off-center"


@pytest.mark.parametrize("am_key,ssm_key", [
    ("ssd", "8"), ("ncc", "6"), ("zncc", "4"), ("ssim", "2")])
def test_chain_matches_ad(scene, am_key, ssm_key):
    """The production one-gather Jacobian chain (LKBase._patch_and_jac)
    agrees with AD through the energy — StdJac/ESMJac/GN-Hessian ADT
    analogs (Diagnostics.h:32-39)."""
    img, corners = scene
    am = get_am(am_key, AMParams(resx=20, resy=20))
    res = Diagnostics(am, get_ssm(ssm_key)).validate_chain(img, corners)
    assert res["ok"], res


@pytest.mark.parametrize("data_type", ["likelihood", "feat_norm"])
def test_sweep_data_types(scene, data_type):
    """ADT::Likelihood / ADT::FeatNorm sweep analogs."""
    img, corners = scene
    am = get_am("ncc", AMParams(resx=20, resy=20))
    sweeps = Diagnostics(am, get_ssm("2")).sweep(
        img, corners, span=0.05, data_type=data_type)
    for d, (xs, ys) in sweeps.items():
        assert np.all(np.isfinite(ys))
        mid = len(xs) // 2
        if data_type == "likelihood":
            assert np.argmax(ys) == mid, f"dim {d}"
        else:  # feature distance from the template is minimal at zero
            assert np.argmin(ys) == mid, f"dim {d}"


# broaden coverage to the rest of the AM zoo (diagnoseMTF's job in the
# reference: every AM must pass the derivative contract). SCV-family
# excluded (frozen remap, see above); CCRE/KLD/LKLD use cumulative/
# ratio histograms whose FD agreement needs looser precision.
@pytest.mark.parametrize("am_key,prec,hess_prec", [
    ("nssd", 2.5e-2, 1e-1), ("sad", 3e-1, 1e30), ("spss", 2.5e-2, 1e-1),
    ("ngf", 5e-2, 2e-1), ("kld", 5e-2, 5e-1), ("lkld", 5e-2, 5e-1),
    ("ccre", 5e-2, 5e-1), ("pca", 2.5e-2, 1e-1), ("sum", 2.5e-2, 1e-1),
])
def test_ad_matches_fd_am_zoo(scene, am_key, prec, hess_prec):
    """|grad| parity for the remaining AMs (SAD's subgradient kinks make
    its FD Hessian meaningless — Jacobian-only there)."""
    img, corners = scene
    am = get_am(am_key, AMParams(resx=20, resy=20))
    rep = Diagnostics(am, get_ssm("4")).validate(img, corners, prec=prec,
                                                 hess_prec=hess_prec)
    assert rep.ok, (f"{am_key}: jac={rep.max_jac_err:.2e} "
                    f"hess={rep.max_hess_err:.2e}")


@pytest.mark.parametrize("ssm_key", ["3", "3s", "4s", "5", "l6", "l8",
                                     "sl3", "c8", "spl"])
def test_ad_matches_fd_ssm_zoo(scene, ssm_key):
    """Derivative contract across the remaining SSM parameterizations."""
    img, corners = scene
    am = get_am("ssd", AMParams(resx=20, resy=20))
    rep = Diagnostics(am, get_ssm(ssm_key)).validate(img, corners)
    assert rep.ok, (f"ssd x {ssm_key}: jac={rep.max_jac_err:.2e} "
                    f"hess={rep.max_hess_err:.2e}")
