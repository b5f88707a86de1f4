"""Grid tracker, RANSAC, and composite SM tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.am import AMParams, get_am
from mtf_tpu.ops import ransac
from mtf_tpu.sm.composite import RKLT, CascadeSM, ParallelSM, PyramidalSM
from mtf_tpu.sm.core import SMParams
from mtf_tpu.sm.grid import GridParams, GridTracker
from mtf_tpu.sm.lk import ESM, FCLK, ICLK
from mtf_tpu.ssm import get_ssm
from mtf_tpu.utils.synth import mean_corner_distance, synthetic_sequence

CORNERS0 = np.array([[50.0, 40.0], [120.0, 40.0], [120.0, 105.0], [50.0, 105.0]],
                    np.float32)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.standard_normal((180, 220)), 2.0)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray((img * 255.0).astype(np.float32))


def run(sm, frames, gt):
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(np.asarray(sm.corners(state)).T, gt[t]))
    return errs, state


def test_ransac_rejects_outliers(rng):
    ssm = get_ssm("hom")
    s_true = jnp.asarray(rng.normal(0, 0.05, 8), jnp.float32)
    src = jnp.asarray(rng.uniform(-1, 1, (60, 2)), jnp.float32)
    dst = ssm.warp_pts(s_true, src)
    dst = dst.at[:15].add(jnp.asarray(rng.normal(0, 0.5, (15, 2)), jnp.float32))
    key = jax.random.PRNGKey(0)
    fit, w = ransac.ransac_fit(ssm, src, dst, key, n_hyps=128,
                               inlier_thresh=0.02)
    err = float(jnp.max(jnp.abs(ssm.warp_pts(fit, src[20:]) - dst[20:])))
    assert err < 0.01, err
    assert float(jnp.sum(w[:15])) < 5  # outliers excluded

    fit2, _ = ransac.lmeds_fit(ssm, src, dst, key, n_hyps=128)
    err2 = float(jnp.max(jnp.abs(ssm.warp_pts(fit2, src[20:]) - dst[20:])))
    assert err2 < 0.02, err2


def test_grid_tracker_homography(base_image):
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.01,
                                    seed=21)
    am = get_am("ssd", AMParams(resx=8, resy=8))
    sm = GridTracker(am, get_ssm("hom"),
                     grid=GridParams(grid_res=8, patch_res=8, sub_iters=8))
    errs, state = run(sm, frames, gt)
    assert max(errs) < 3.0, f"errors {errs}"
    assert state.extra.inlier_mask.shape == (64,)


def test_grid_tracker_fb_masking(base_image):
    ssm_gen = get_ssm("sim")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=4, sigma_scale=0.015,
                                    seed=22)
    am = get_am("ssd", AMParams(resx=8, resy=8))
    sm = GridTracker(am, get_ssm("sim"),
                     grid=GridParams(grid_res=6, patch_res=8, sub_iters=8,
                                     fb_err_px=3.0))
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 3.0, f"errors {errs}"


def test_pyramidal_large_motion(base_image):
    # motion too large for plain FCLK at fine scale
    ssm_gen = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=4, sigma_scale=0.12,
                                    seed=23)
    am = get_am("ncc", AMParams(resx=20, resy=20))
    plain = FCLK(am, get_ssm("trans"), SMParams(max_iters=30))
    pyr = PyramidalSM(FCLK(am, get_ssm("trans"), SMParams(max_iters=30)),
                      n_levels=3)
    errs_plain, _ = run(plain, frames, gt)
    errs_pyr, _ = run(pyr, frames, gt)
    assert max(errs_pyr) < 1.0, f"pyr errors {errs_pyr}"
    assert max(errs_pyr) <= max(errs_plain) + 1e-6


def test_cascade_nn_then_iclk(base_image):
    from mtf_tpu.sm.nn import NN, NNParams
    ssm_gen = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.05,
                                    seed=24)
    am_prm = AMParams(resx=20, resy=20)
    nn = NN(get_am("zncc", am_prm), get_ssm("trans"),
            nn=NNParams(n_samples=500, pix_sigma=8.0, max_iters=2))
    ic = ICLK(get_am("ssd", am_prm), get_ssm("trans"), SMParams(max_iters=20))
    sm = CascadeSM([nn, ic])
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 0.8, f"errors {errs}"


def test_parallel_fusion(base_image):
    ssm_gen = get_ssm("trans")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=4, sigma_scale=0.03,
                                    seed=25)
    am_prm = AMParams(resx=20, resy=20)
    sm = ParallelSM([
        FCLK(get_am("ssd", am_prm), get_ssm("trans"), SMParams(max_iters=25)),
        FCLK(get_am("ncc", am_prm), get_ssm("trans"), SMParams(max_iters=25)),
    ])
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 0.8, f"errors {errs}"


def test_rklt_sota_config(base_image):
    """The reference's claimed SOTA: grid + ESM/NCC homography refiner
    (ReadMe.md:432)."""
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=6, sigma_scale=0.012,
                                    seed=26)
    grid = GridTracker(get_am("ssd", AMParams(resx=8, resy=8)), get_ssm("hom"),
                       grid=GridParams(grid_res=8, patch_res=8, sub_iters=8))
    templ = ESM(get_am("ncc", AMParams(resx=25, resy=25)), get_ssm("hom"),
                SMParams(max_iters=30, hess_type="selft", enable_lm=True))
    sm = RKLT(grid, templ)
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 1.0, f"errors {errs}"


def test_grid_tracker_pyramidal_flow(base_image):
    """grid_sm="cv" analog: coarse-to-fine pyramidal LK flow
    (GridTrackerCV.cc:208-275) handles larger motion than one level."""
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.01,
                                    seed=23)
    am = get_am("ssd", AMParams(resx=8, resy=8))
    sm = GridTracker(am, get_ssm("hom"),
                     grid=GridParams(grid_res=8, patch_res=8, sub_iters=8,
                                     pyramid_levels=3))
    errs, _ = run(sm, frames, gt)
    assert max(errs) < 3.0, f"errors {errs}"


def test_sub_tracker_grid(base_image):
    """General GridTracker (GridTracker.cc:247-269): arbitrary SM per patch,
    vmapped, fused by robust fit."""
    from mtf_tpu.sm.grid import SubTrackerGrid
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.01,
                                    seed=24)
    am8 = get_am("ssd", AMParams(resx=8, resy=8))
    sub = ICLK(am8, get_ssm("2"), SMParams(max_iters=8, epsilon=0.0))
    sm = SubTrackerGrid(sub, get_ssm("hom"),
                        grid=GridParams(grid_res=8, patch_res=8))
    errs, state = run(sm, frames, gt)
    assert max(errs) < 1.0, f"errors {errs}"
    assert state.extra.inlier_mask.shape == (64,)


def test_grid_sm_factory_dispatch():
    """grid_sm cfg key routes to flow / pyramidal / sub-tracker grids
    (mtf.h:748-803)."""
    from mtf_tpu import create_tracker
    from mtf_tpu.sm.grid import GridTracker as GT, SubTrackerGrid as STG
    t1 = create_tracker("grid", "ssd", "8", grid_res=4)
    # factory default must match GridParams' documented default (pyramidal
    # flow is essential — ADVICE r1)
    assert isinstance(t1, GT)
    assert t1.grid.pyramid_levels == GridParams.pyramid_levels == 2
    t2 = create_tracker("grid", "ssd", "8", grid_res=4, grid_sm="cv")
    assert isinstance(t2, GT) and t2.grid.pyramid_levels == 3
    t3 = create_tracker("grid", "ssd", "8", grid_res=4, grid_sm="iclk",
                        grid_ssm="2", max_iters=4)
    assert isinstance(t3, STG)


def test_rklt_spi_feedback(test_image):
    """NT/RKLT.cc:100: grid inlier mask feeds the template SM as SPI."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtf_tpu import create_tracker

    trk = create_tracker("rklt", "ssd", "8", enable_spi=True)
    assert trk.prm.enable_spi
    h, w = np.asarray(test_image).shape[:2]
    c = jnp.asarray([[w/2-40, h/2-30], [w/2+40, h/2-30],
                     [w/2+40, h/2+30], [w/2-40, h/2+30]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    st = trk.update(st, jnp.asarray(test_image))
    out = np.asarray(trk.corners(st))
    assert np.all(np.isfinite(out))
    assert float(np.max(np.abs(out.T - np.asarray(c)))) < 5.0


def test_cascade_auto_reinit(test_image):
    """CascadeTracker.cc:25-40: a diverging member snaps back to the
    previous member's region."""
    import jax.numpy as jnp
    import numpy as np

    from mtf_tpu import create_tracker

    trk = create_tracker("pffc", "ssd", "2", casc_reinit_thresh=5.0,
                         pf_n_particles=30)
    assert trk.auto_reinit_thresh == 5.0
    c = jnp.asarray([[40, 30], [90, 30], [90, 80], [40, 80]], jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), c)
    st = trk.update(st, jnp.asarray(test_image))
    out = np.asarray(trk.corners(st)).T
    assert np.all(np.isfinite(out))
    # static scene: final estimate stays within the reinit threshold
    assert float(np.max(np.abs(out - np.asarray(c)))) < 6.0


def test_grid_per_level_schedule_and_coarse_stride(base_image):
    """Per-pyramid-level sub_iters schedules + coarse point decimation
    (GridParams.sub_iters tuple / coarse_point_stride) track as well as
    the flat schedule: the coarse level absorbs the large motion, so the
    full-res level only polishes, and the pyramid-low-passed coarse frame
    is oversampled by the full patch grid."""
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=5, sigma_scale=0.01,
                                    seed=21)
    am = get_am("ssd", AMParams(resx=8, resy=8))
    flat = GridTracker(am, get_ssm("hom"),
                       grid=GridParams(grid_res=8, patch_res=8, sub_iters=8))
    sched = GridTracker(am, get_ssm("hom"),
                        grid=GridParams(grid_res=8, patch_res=8,
                                        sub_iters=(3, 8),
                                        coarse_point_stride=2))
    errs_flat, _ = run(flat, frames, gt)
    errs_sched, _ = run(sched, frames, gt)
    assert max(errs_sched) < 3.0, f"errors {errs_sched}"
    assert max(errs_sched) <= max(errs_flat) + 0.5


def test_rklt_grid_schedule_factory_knobs(base_image):
    """rklt with grid_sub_iters tuple + grid_coarse_stride (the r4 bench
    configuration) stays within the flat-schedule accuracy budget."""
    from mtf_tpu import create_tracker
    ssm_gen = get_ssm("hom")
    frames, gt = synthetic_sequence(base_image, jnp.asarray(CORNERS0),
                                    ssm_gen, n_frames=4, sigma_scale=0.008,
                                    seed=31)
    sm = create_tracker("rklt", "ssd", "8", resx=25, resy=25,
                        max_iters=10, epsilon=0.0,
                        grid_sub_iters=(2, 8), grid_coarse_stride=2)
    state = sm.initialize(frames[0], jnp.asarray(gt[0]))
    update = jax.jit(sm.update)
    errs = []
    for t in range(1, len(frames)):
        state = update(state, frames[t])
        errs.append(mean_corner_distance(
            np.asarray(sm.corners(state)).T, gt[t]))
    assert max(errs) < 2.0, f"errors {errs}"
