"""Particle filter + nearest-neighbour SM tests on synthetic sequences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am
from mtf_tpu.sm.core import SMParams, image_corners
from mtf_tpu.sm.nn import NN, NNParams
from mtf_tpu.sm.pf import PF, PFParams
from mtf_tpu.ssm import get_ssm
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

RES = 20
CORNERS0 = np.array([[50.0, 40.0], [110.0, 40.0], [110.0, 95.0], [50.0, 95.0]],
                    np.float32)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((160, 200)), 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


def run(sm, frames, gt):
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(image_corners(sm.ssm, state)), gt[t]))
    return errs, state


def run2(sm, frames, gt):
    """Like `run` but via the tracker's own corners() (composite-safe)."""
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(sm.corners(state)).T, gt[t]))
    return errs, state


@pytest.mark.parametrize("mean_type", ["weighted", "corner", "best"])
def test_pf_translation(base_image, mean_type):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=11)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    sm = PF(am, get_ssm("trans"),
            pf=PFParams(n_particles=400, pix_sigma=4.0, mean_type=mean_type,
                        likelihood="gaussian", measurement_sigma=0.05))
    errs, state = run(sm, frames, gt)
    assert max(errs) < 3.0, f"{mean_type}: errors {errs}"
    # particles kept, weights normalized
    w = np.exp(np.asarray(state.extra.log_weights))
    assert abs(w.sum() - 1.0) < 1e-3


def test_pf_ar1_similitude(base_image):
    ssm = get_ssm("sim")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.015, seed=12)
    am = get_am("ncc", AMParams(resx=RES, resy=RES))
    sm = PF(am, get_ssm("sim"),
            pf=PFParams(n_particles=600, pix_sigma=3.0, dynamic_model="ar1",
                        likelihood="gaussian", measurement_sigma=0.05))
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 4.0, f"errors {errs}"


def test_nn_translation(base_image):
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=13)
    am = get_am("zncc", AMParams(resx=RES, resy=RES))
    sm = NN(am, get_ssm("trans"), nn=NNParams(n_samples=800, pix_sigma=6.0,
                                              max_iters=4))
    errs, state = run(sm, frames, gt)
    assert state.extra.feats.shape[0] == 800
    assert max(errs) < 3.0, f"errors {errs}"


def test_nn_identity_sample_keeps_match(base_image):
    # frame identical to init: NN must keep the region in place via the
    # identity sample at index 0
    am = get_am("ssd", AMParams(resx=RES, resy=RES))
    sm = NN(am, get_ssm("trans"), nn=NNParams(n_samples=200, pix_sigma=5.0,
                                              max_iters=2))
    state = sm.initialize(base_image, jnp.asarray(CORNERS0))
    state2 = jax.jit(sm.update)(state, base_image)
    c = np.asarray(image_corners(sm.ssm, state2))
    assert mean_corner_distance(c, CORNERS0) < 0.5


def test_pf_jacobian_as_sigma(test_image):
    """NT/PF.cc:214-227: sampler sigma from one GN step."""
    import jax
    import jax.numpy as jnp

    from mtf_tpu import create_tracker

    trk = create_tracker("pf", "ssd", "2", pf_jacobian_as_sigma=True,
                         pf_n_particles=50)
    assert trk.pf.jacobian_as_sigma
    c = jnp.asarray([[40, 30], [90, 30], [90, 80], [40, 80]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    st = jax.jit(trk.update)(st, jnp.asarray(test_image))
    import numpy as np
    assert np.all(np.isfinite(np.asarray(trk.corners(st))))


def test_nn_online_sample_addition(test_image):
    """NNParams.h:29-33: ring-replacement of dataset samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtf_tpu import create_tracker

    trk = create_tracker("nn", "ssd", "2", nn_n_samples=64,
                         nn_add_samples_gap=1, nn_n_samples_to_add=4)
    c = jnp.asarray([[40, 30], [90, 30], [90, 80], [40, 80]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    feats0 = np.asarray(st.extra.feats).copy()
    st = jax.jit(trk.update)(st, jnp.asarray(test_image))
    assert int(st.extra.ptr) == 4
    assert int(st.extra.frame_idx) == 1
    # identity sample 0 untouched; some ring slots replaced
    assert np.allclose(np.asarray(st.extra.feats)[0], feats0[0])
    assert not np.allclose(np.asarray(st.extra.feats)[1:5], feats0[1:5])


def test_pf_multi_distribution_adaptive(test_image):
    """Multi-sampler PF: adaptive distribution weights shift toward the
    distribution whose particles carry the likelihood mass."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtf_tpu import create_tracker

    trk = create_tracker("pf", "ssd", "2", pf_n_particles=120,
                         pf_ssm_sigmas=((0.01, 0.01), (0.3, 0.3)))
    c = jnp.asarray([[40, 30], [90, 30], [90, 80], [40, 80]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    upd = jax.jit(trk.update)
    for _ in range(4):
        st = upd(st, jnp.asarray(test_image))
    w = np.exp(np.asarray(st.extra.distr_log_w))
    # static scene: the tight distribution must dominate
    assert w[0] > w[1]
    assert abs(w.sum() - 1.0) < 1e-4


def test_gnn_graph_build_exact(base_image):
    """build_knn_graph rows = exact kNN (vs numpy brute force), no self."""
    from mtf_tpu.sm.nn import build_knn_graph

    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((73, 16)).astype(np.float32))
    fsq = jnp.sum(feats * feats, axis=-1)
    g = np.asarray(build_knn_graph(feats, fsq, 5, block=32))
    f = np.asarray(feats)
    d = ((f ** 2).sum(-1)[:, None] - 2 * f @ f.T + (f ** 2).sum(-1)[None, :])
    np.fill_diagonal(d, np.inf)
    ref = np.argsort(d, axis=1)[:, :5]
    assert g.shape == (73, 5)
    assert not np.any(g == np.arange(73)[:, None])
    # sets match (order can differ on ties)
    for i in range(73):
        assert set(g[i]) == set(ref[i]), i


def test_gnn_tracking(base_image):
    """gnn key: greedy graph descent tracks a translation sequence
    (GNN.cc/FGNN.h semantics, SURVEY.md §3.4)."""
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=17)
    am = get_am("zncc", AMParams(resx=RES, resy=RES))
    sm = NN(am, get_ssm("trans"),
            nn=NNParams(n_samples=800, pix_sigma=6.0, max_iters=4,
                        use_gnn=True, gnn_k=12, gnn_max_steps=40))
    errs, state = run(sm, frames, gt)
    assert state.extra.graph.shape == (800, 12)
    assert max(errs) < 3.5, f"errors {errs}"


def test_gnn_factory_key_and_online_addition(test_image):
    import jax

    from mtf_tpu import create_tracker

    trk = create_tracker("fgnn", "ssd", "2", nn_n_samples=64, gnn_k=6,
                         nn_add_samples_gap=1, nn_n_samples_to_add=4)
    assert trk.nn.use_gnn
    c = jnp.asarray([[40, 30], [90, 30], [90, 80], [40, 80]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    g0 = np.asarray(st.extra.graph).copy()
    assert g0.shape == (64, 6)
    st = jax.jit(trk.update)(st, jnp.asarray(test_image))
    # replaced ring slots got reconnected to their new kNN
    assert st.extra.graph is not None
    assert np.all(np.asarray(st.extra.graph) < 64)
    # identity frame: region stays put through graph descent
    assert mean_corner_distance(np.asarray(trk.corners(st)).T,
                                np.asarray(c)) < 0.5


def test_pfsl3_native_key(base_image):
    """pfsl3 = native PF x SL3 + NCC LK refiner (reference
    ThirdParty/PFSL3/src/PFSL3.cc rebuilt from owned parts): constructs
    from the factory key and tracks a synthetic SL3 sequence to
    sub-pixel."""
    from mtf_tpu import create_tracker
    from mtf_tpu.ssm.projective import SL3

    trk = create_tracker("pfsl3", resx=RES, resy=RES,
                         pfsl3_n=40, pfsl3_n_c=5, seed=2)
    assert isinstance(trk.ssm, SL3)
    pf_stage = trk.members[0]
    assert isinstance(pf_stage.ssm, SL3)
    assert pf_stage.pf.n_particles == 200
    assert pf_stage.pf.dynamic_model == "ar1"
    assert pf_stage.pf.likelihood == "gaussian"
    ssm = get_ssm("sl3")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=5, sigma_scale=0.004, seed=14)
    errs, _ = run2(trk, frames, gt)
    assert max(errs) < 1.0, f"errors {errs}"


def test_pf_am_state_sampling(base_image):
    """AM stochastic-sampler analog (AppearanceModel.h:303-325): PF
    photometric particles track a gain+bias drift that defeats plain SSD."""
    from mtf_tpu import create_tracker
    from mtf_tpu.utils.synth import synthetic_sequence

    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.02, seed=21,
                                    gain_drift=0.06, bias_drift=6.0)
    kw = dict(pf_n_particles=500, pf_pix_sigma=4.0,
              pf_likelihood="gaussian", pf_measurement_sigma=0.05,
              resx=RES, resy=RES, seed=3)
    trk = create_tracker("pf", "ssd", "trans", ilm="gb",
                         pf_am_sigma=(0.05, 5.0), **kw)
    errs, state = run(trk, frames, gt)
    assert state.extra.am_particles.shape == (500, 2)
    # the mean photometric state should move off identity toward the drift
    assert float(jnp.abs(state.am_state.p_am).sum()) > 1e-3
    assert max(errs) < 4.0, f"with AM sampling: {errs}"


def test_pf_score_stride_decimated_measurement(base_image):
    """PFParams.score_stride > 1 scores particle likelihoods on a
    stride-decimated point grid (the dominant device cost of the PF is
    the particle sampling pass, linear in points) without degrading
    tracking: the likelihood only ranks particles. Template learning
    keeps the decimated scoring template in sync with the full one."""
    ssm = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0), ssm,
                                    n_frames=6, sigma_scale=0.03, seed=11)
    am = get_am("ncc", AMParams(resx=RES, resy=RES, learning_rate=0.05))
    base = dict(n_particles=400, pix_sigma=4.0, likelihood="gaussian",
                measurement_sigma=0.05)
    full = PF(am, get_ssm("trans"), pf=PFParams(**base))
    dec = PF(am, get_ssm("trans"), pf=PFParams(score_stride=2, **base))
    errs_full, _ = run(full, frames, gt)
    errs_dec, st = run(dec, frames, gt)
    assert max(errs_dec) < 3.0, f"errors {errs_dec}"
    assert max(errs_dec) <= max(errs_full) + 1.0
    # decimated scoring template tracked the learned full template
    sub = np.asarray(st.am_state.template)[np.asarray(dec._score_idx)]
    assert np.allclose(np.asarray(st.extra.score_am.template), sub,
                       atol=1e-5)
