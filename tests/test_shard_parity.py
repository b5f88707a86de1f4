"""Sharded == unsharded equivalence (VERDICT round-1 item #4).

BASELINE milestone configs #4 (PF + NN with sharded populations) and #5
(multi-patch grid + RANSAC homography across a mesh) must produce the
same trajectories as their single-program counterparts for the same seed.
All sharded modules draw randomness from replicated keys and slice per
shard, so these are near-bitwise comparisons, not loose statistical ones.
Runs on the conftest 8-virtual-device CPU mesh.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.parallel import (ShardedGridTracker, ShardedNN, ShardedPF,
                              make_mesh)
from mtf_tpu.sm.grid import GridParams, GridTracker
from mtf_tpu.sm.nn import NN, NNParams
from mtf_tpu.sm.pf import PF, PFParams
from mtf_tpu.utils import synth


@pytest.fixture
def frames(test_image):
    img = jnp.asarray(test_image)
    Wm = jnp.array([[1.01, 0.004, 1.5], [0.002, 0.99, -1.0], [0, 0, 1]],
                   jnp.float32)
    return img, synth.warp_image(img, Wm)


CORNERS = jnp.asarray([[50, 40], [110, 40], [110, 100], [50, 100]],
                      jnp.float32)


@pytest.mark.parametrize("pfp", [
    PFParams(n_particles=64, seed=3),
    PFParams(n_particles=64, seed=3,
             ssm_sigmas=((0.01, 0.01), (0.05, 0.05))),
    PFParams(n_particles=64, seed=3, jacobian_as_sigma=True),
    PFParams(n_particles=64, seed=3, score_stride=2, score_blur=True,
             score_downsample=True),
], ids=["base", "multi-distr", "jac-sigma", "score-downsample"])
def test_sharded_pf_matches_unsharded(frames, pfp):
    img, img2 = frames
    mesh = make_mesh({"particle": 8})
    base = create_tracker("fclk", "ssd", "2", resx=12, resy=12)
    spf = ShardedPF(base.am, base.ssm, base.prm, pfp, mesh=mesh)
    pf = PF(base.am, base.ssm, base.prm, pfp)
    st_s = spf.place(spf.initialize(img, CORNERS))
    st_u = pf.initialize(img, CORNERS)
    for _ in range(3):
        st_s = spf.update(st_s, img2)
        st_u = pf.update(st_u, img2)
    np.testing.assert_allclose(np.asarray(st_s.ssm_state),
                               np.asarray(st_u.ssm_state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_s.extra.log_weights),
                               np.asarray(st_u.extra.log_weights),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_s.extra.distr_log_w),
                               np.asarray(st_u.extra.distr_log_w),
                               atol=1e-5)


def test_sharded_pf_am_particles(frames):
    """Photometric AM-state particles survive sharding (gain+bias ILM)."""
    img, img2 = frames
    mesh = make_mesh({"particle": 8})
    base = create_tracker("fclk", "ssd", "2", ilm="gb", resx=12, resy=12)
    pfp = PFParams(n_particles=64, seed=3, am_sigma=(0.05, 0.05))
    spf = ShardedPF(base.am, base.ssm, base.prm, pfp, mesh=mesh)
    pf = PF(base.am, base.ssm, base.prm, pfp)
    st_s = spf.place(spf.initialize(img, CORNERS))
    st_u = pf.initialize(img, CORNERS)
    for _ in range(2):
        st_s = spf.update(st_s, img2)
        st_u = pf.update(st_u, img2)
    np.testing.assert_allclose(np.asarray(st_s.am_state.p_am),
                               np.asarray(st_u.am_state.p_am), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_s.extra.am_particles),
                               np.asarray(st_u.extra.am_particles),
                               atol=1e-5)


@pytest.mark.parametrize("nnp", [
    NNParams(n_samples=256, seed=1),
    NNParams(n_samples=256, seed=1, add_samples_gap=1),
], ids=["static", "online-additions"])
def test_sharded_nn_matches_unsharded(frames, nnp):
    img, img2 = frames
    mesh = make_mesh({"sample": 8})
    base = create_tracker("fclk", "ssd", "2", resx=12, resy=12)
    snn = ShardedNN(base.am, base.ssm, base.prm, nnp, mesh=mesh)
    nn = NN(base.am, base.ssm, base.prm, nnp)
    st_s = snn.place(snn.initialize(img, CORNERS))
    st_u = nn.initialize(img, CORNERS)
    np.testing.assert_allclose(np.asarray(st_s.extra.feats),
                               np.asarray(st_u.extra.feats), atol=1e-5)
    for _ in range(3):
        st_s = snn.update(st_s, img2)
        st_u = nn.update(st_u, img2)
    np.testing.assert_allclose(np.asarray(st_s.ssm_state),
                               np.asarray(st_u.ssm_state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_s.extra.feats),
                               np.asarray(st_u.extra.feats), atol=1e-5)


def test_sharded_nn_rejects_gnn():
    mesh = make_mesh({"sample": 8})
    base = create_tracker("fclk", "ssd", "2", resx=12, resy=12)
    with pytest.raises(ValueError):
        ShardedNN(base.am, base.ssm, base.prm,
                  NNParams(n_samples=256, use_gnn=True), mesh=mesh)


@pytest.mark.parametrize("grid_res,est,atol", [
    # RANSAC scores are (near-)integer inlier counts: selection is robust
    # to fp batching jitter, so sharded == unsharded to fp precision.
    (8, "ransac", 1e-3),    # 64 patches: divides the 8-device mesh
    (10, "ransac", 1e-3),   # 100 patches: exercises the padding path
    # LMedS selects on a continuous median: fp jitter between a (64,)-
    # and an (8,)-batched fit_pts can flip between near-identical
    # hypotheses, so only corner-level agreement is asserted.
    (8, "lmeds", 0.3),
], ids=["ransac-64", "ransac-100-padded", "lmeds-64"])
def test_sharded_grid_matches_unsharded(frames, grid_res, est, atol):
    img, img2 = frames
    mesh = make_mesh({"patch": 8})
    base = create_tracker("fclk", "ssd", "8", resx=12, resy=12)
    gp = GridParams(grid_res=grid_res, patch_res=8, sub_iters=8,
                    pyramid_levels=2, estimator=est, seed=0)
    sg = ShardedGridTracker(base.am, base.ssm, base.prm, gp, mesh=mesh)
    gt = GridTracker(base.am, base.ssm, base.prm, gp)
    st_s = sg.initialize(img, CORNERS)
    st_u = gt.initialize(img, CORNERS)
    for _ in range(2):
        st_s = sg.update(st_s, img2)
        st_u = gt.update(st_u, img2)
    np.testing.assert_allclose(np.asarray(sg.corners(st_s)),
                               np.asarray(gt.corners(st_u)), atol=atol)
    if est == "ransac":
        np.testing.assert_allclose(np.asarray(st_s.extra.inlier_mask),
                                   np.asarray(st_u.extra.inlier_mask),
                                   atol=1e-5)


def test_rklt_with_sharded_grid(frames):
    """RKLT (the SOTA config) composes with the sharded grid stage."""
    from mtf_tpu.sm.composite import RKLT, RKLTParams

    img, img2 = frames
    mesh = make_mesh({"patch": 8})
    base = create_tracker("fclk", "ssd", "8", resx=12, resy=12)
    gp = GridParams(grid_res=8, patch_res=8, sub_iters=8,
                    pyramid_levels=2, seed=0)
    grid = ShardedGridTracker(base.am, base.ssm, base.prm, gp, mesh=mesh)
    templ = create_tracker("eslm", "ncc", "8", resx=16, resy=16,
                           max_iters=10)
    rklt = RKLT(grid, templ, RKLTParams())
    st = rklt.initialize(img, CORNERS)
    st = rklt.update(st, img2)
    out = np.asarray(rklt.corners(st))
    assert np.isfinite(out).all()
    # the true warp moves the corners a few px; RKLT should land close
    Wm = np.array([[1.01, 0.004, 1.5], [0.002, 0.99, -1.0], [0, 0, 1]],
                  np.float32)
    c = np.asarray(CORNERS)
    ch = np.concatenate([c, np.ones((4, 1), np.float32)], axis=1) @ Wm.T
    expected = (ch[:, :2] / ch[:, 2:]).T
    err = np.linalg.norm(out - expected, axis=0).mean()
    assert err < 1.5, err
