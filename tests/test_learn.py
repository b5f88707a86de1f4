"""Native learning/detection trackers (sm/learn.py RCT, MedianFlow via
the grid median estimator) + the coarse-to-fine point-decimation LK
schedule (SMParams.coarse_pt_iters)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mtf_tpu
from mtf_tpu.utils import synth


def _scene(seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, (h, w)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


CORNERS0 = np.array([[110, 80], [210, 80], [210, 160], [110, 160]],
                    np.float32)


def _track(trk, frames, gt):
    state = trk.initialize(frames[0], jnp.asarray(gt[0]))
    errs = []
    for i in range(1, len(frames)):
        state = trk.update(state, frames[i])
        c = np.asarray(trk.corners(state)).T
        errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
    return errs


def test_rct_tracks_translation():
    """Compressive tracking recovers a translating target (RCT is a
    coarse classifier tracker: a few px of error is in-family)."""
    trk = mtf_tpu.create_tracker("rct", "ssd", "2")
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, get_ssm("2"), n_frames=8,
        sigma_scale=0.01, seed=3)
    errs = _track(trk, frames, gt)
    assert np.mean(errs) < 3.0, errs


def test_rct_state_is_pytree():
    trk = mtf_tpu.create_tracker("rct", "ssd", "2")
    st = trk.initialize(_scene(), jnp.asarray(CORNERS0))
    leaves = jax.tree_util.tree_leaves(st)
    assert all(isinstance(x, jax.Array) for x in leaves)
    # jittable update
    st2 = jax.jit(trk.update)(st, _scene())
    assert np.all(np.isfinite(np.asarray(st2.mu_pos)))


@pytest.mark.parametrize("key,am", [("esm", "ncc"), ("iclk", "ssd")])
def test_generic_coarse_pt_iters_matches_full(key, am):
    """r4: coarse_pt_iters on the GENERIC (XLA dense) path — previously
    fused-SSD-only. The decimated phases must land within a fraction of
    a pixel of the full-resolution schedule (and the final full-res
    iterations set the fixed point)."""
    from mtf_tpu.utils import synth
    img = _scene(3)
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(img, CORNERS0, get_ssm("8"),
                                          n_frames=5, sigma_scale=0.01,
                                          seed=5)
    base = dict(resx=50, resy=50, max_iters=10, epsilon=0.0,
                interp="linear_mm", crop=144)
    errs = {}
    for tag, kw in [("full", {}),
                    ("coarse", dict(coarse_pt_iters=((4, 6), (2, 3))))]:
        trk = mtf_tpu.create_tracker(key, am, "8", **base, **kw)
        assert (tag == "full") or trk.initialize(
            frames[0], jnp.asarray(gt[0])).extra.coarse, \
            "coarse packs missing on the generic path"
        errs[tag] = np.mean(_track(trk, frames, gt))
    assert errs["coarse"] < errs["full"] + 0.3, errs


def test_mil_tracks_translation():
    """Online MILBoost (ThirdParty/MIL analog) recovers a translating
    target; the per-frame boost selects distinct pool features."""
    trk = mtf_tpu.create_tracker("mil")
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, get_ssm("2"), n_frames=8,
        sigma_scale=0.01, seed=3)
    state = trk.initialize(frames[0], jnp.asarray(gt[0]))
    sel = np.asarray(state.sel)
    assert len(np.unique(sel)) == len(sel)  # no repeated weak classifier
    errs = []
    upd = jax.jit(trk.update)
    for i in range(1, len(frames)):
        state = upd(state, frames[i])
        c = np.asarray(trk.corners(state)).T
        errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
    assert np.mean(errs) < 3.0, errs


def test_boost_tracks_translation():
    """Online-AdaBoost tracker (ThirdParty/Boosting analog): selector
    alphas positive, target tracked within the coarse family."""
    trk = mtf_tpu.create_tracker("boost")
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, get_ssm("2"), n_frames=8,
        sigma_scale=0.01, seed=4)
    state = trk.initialize(frames[0], jnp.asarray(gt[0]))
    assert np.all(np.asarray(state.alpha) > 0)
    errs = []
    upd = jax.jit(trk.update)
    for i in range(1, len(frames)):
        state = upd(state, frames[i])
        c = np.asarray(trk.corners(state)).T
        errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
    assert np.mean(errs) < 3.5, errs


def test_mil_boost_discriminative_vs_noise():
    """Drift-resistance check (VERDICT r4 #6): after learning on a
    scene, the boosted score at the true window must dominate a
    noise-textured impostor window of matched variance."""
    trk = mtf_tpu.create_tracker("mil")
    frame = _scene(5)
    st = trk.initialize(frame, jnp.asarray(CORNERS0))
    st = trk.update(st, frame)
    feats = trk._shift_feats(frame, st.center, st.base_sz)
    h = trk._weak_h(st, feats)
    score = np.asarray(jnp.sum(h[:, st.sel], axis=1))
    S = score.shape[0]
    center_idx = S // 2
    # true window beats 95% of the shift ring
    assert score[center_idx] >= np.percentile(score, 95)


def test_struck_tracks_translation():
    """Structured-output SVM keeps hold of a translating target (lite
    LaRank: budgeted hard-negative SMO; coarse-tracker error family)."""
    trk = mtf_tpu.create_tracker("strk", "ssd", "2")
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, get_ssm("2"), n_frames=8,
        sigma_scale=0.01, seed=7)
    errs = _track(trk, frames, gt)
    assert np.mean(errs) < 3.0, errs


def test_struck_budget_bounded():
    trk = mtf_tpu.create_tracker("strk", "ssd", "2", budget=16)
    st = trk.initialize(_scene(), jnp.asarray(CORNERS0))
    for _ in range(4):
        st = trk.update(st, _scene())
    assert st.sv_x.shape[0] == 16
    assert np.all(np.isfinite(np.asarray(st.sv_beta)))


def test_medianflow_tracks_similarity():
    trk = mtf_tpu.create_tracker("mf", "ssd", "4")
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, trk.ssm, n_frames=8, sigma_scale=0.01, seed=3)
    errs = _track(trk, frames, gt)
    assert np.mean(errs) < 2.5, errs


def test_fragtrack_partial_occlusion():
    """Fragment-quantile voting keeps hold when a quarter of the target
    is blanked out (the FragTrack occlusion property)."""
    trk = mtf_tpu.create_tracker("frg", "ssd", "2")
    from mtf_tpu.ssm import get_ssm
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, get_ssm("2"), n_frames=8,
        sigma_scale=0.008, seed=3)
    occ = []
    for i, f in enumerate(frames):
        if i >= 3:
            c = gt[i].mean(0).astype(int)
            f = f.at[c[1]:c[1] + 40, c[0]:c[0] + 50].set(0.0)
        occ.append(f)
    errs = _track(trk, occ, gt)
    assert np.mean(errs) < 4.0, errs


def test_dft_illumination_robustness():
    """Descriptor-Fields tracking shrugs off an abrupt gain+offset
    illumination change that breaks plain intensity SSD."""
    from mtf_tpu.ssm import get_ssm
    ssm = get_ssm("8")
    frames, gt = synth.synthetic_sequence(
        _scene(), CORNERS0, ssm, n_frames=8, sigma_scale=0.015, seed=3)
    frames = [jnp.clip(f * 1.4 + 18.0, 0, 255) if i >= 4 else f
              for i, f in enumerate(frames)]

    def final_err(key):
        trk = mtf_tpu.create_tracker(key, "ssd", "8", resx=40, resy=40,
                                     max_iters=30)
        errs = _track(trk, frames, gt)
        return max(errs[3:])

    e_dft = final_err("dft")
    e_ssd = final_err("esm")
    assert e_dft < 1.0, e_dft
    assert e_dft < 0.5 * e_ssd, (e_dft, e_ssd)


def test_median_flow_fit_robust_to_outliers():
    """Pairwise-median similarity fit: exact on inliers, immune to 30%
    gross outliers (the Kalal median property)."""
    from mtf_tpu.ops import ransac
    from mtf_tpu.ssm import get_ssm
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-0.5, 0.5, (30, 2)), jnp.float32)
    s_true, t_true = 1.15, np.array([0.07, -0.04], np.float32)
    dst = np.array(s_true * np.asarray(src) + t_true)
    dst[:9] += rng.uniform(0.3, 0.6, (9, 2))  # gross outliers
    w = np.ones(30, np.float32)
    w[:9] = 0.0
    ssm = get_ssm("4")
    state, _ = ransac.median_flow_fit(ssm, src, jnp.asarray(dst),
                                      jnp.asarray(w))
    rec = np.asarray(ssm.warp_pts(state, src))
    exact = s_true * np.asarray(src) + t_true
    assert np.max(np.abs(rec - exact)) < 1e-3


@pytest.mark.parametrize("phases", [((2, 6),), ((4, 6), (2, 3))])
def test_coarse_pt_iters_matches_full(phases):
    """Anti-aliased point-decimation phases track within a hair of the
    full-resolution schedule on moderate motion (and the corner diff
    stays sub-0.1px)."""
    def run(kw):
        trk = mtf_tpu.create_tracker(
            "fclk", "ssd", "8", resx=50, resy=50, max_iters=10,
            epsilon=0.0, interp="linear_mm", crop=144, use_pallas=True,
            **kw)
        frames, gt = synth.synthetic_sequence(
            _scene(), CORNERS0, trk.ssm, n_frames=5,
            sigma_scale=0.015, seed=3)
        state = trk.initialize(frames[0], jnp.asarray(gt[0]))
        cs = []
        for i in range(1, len(frames)):
            state = trk.update(state, frames[i])
            cs.append(np.asarray(trk.corners(state)).T)
        return np.asarray(cs)

    c_full = run({})
    c_coarse = run(dict(coarse_pt_iters=phases))
    assert np.max(np.abs(c_full - c_coarse)) < 0.1, \
        np.max(np.abs(c_full - c_coarse))
