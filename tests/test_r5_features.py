"""Round-5 feature regression tests: fused grid flow, chain-kernel
NCC/ESM/MC modes, LM coarse phases, PF hierarchical scoring.

All run on the forced-CPU conftest backend; the Pallas kernels execute
in interpret mode (compiled-mode parity is the MTF_TPU_CI=1 lane,
tests/test_tpu_compiled.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.utils import synth


def _scene2(rng, h=240, w=320, ch=None):
    shape = (h, w) if ch is None else (h, w, ch)
    img = np.cumsum(np.cumsum(rng.normal(0, 1, shape), 0), 1)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def _one_update_corners(key, am, use_pallas, frame, f2, **kw):
    trk = create_tracker(key, am, "8", resx=50, resy=50, max_iters=10,
                         epsilon=0.0, interp="linear_mm", crop=144,
                         use_pallas=use_pallas, **kw)
    corners = jnp.asarray([[110, 80], [210, 80], [210, 160], [110, 160]],
                          jnp.float32)
    st = trk.initialize(frame, corners)
    if use_pallas:
        assert trk._fused_ok(st, frame), (key, am, kw, "not fused")
    st = jax.jit(trk.update)(st, f2)
    return np.asarray(trk.corners(st))


@pytest.mark.parametrize("key,am,kw", [
    ("esm", "ncc", {}),
    ("fclk", "ncc", {}),
    ("esm", "ssd", {}),
    ("esm", "ncc", {"coarse_pt_iters": ((2, 4),)}),
    ("esm", "ncc", {"hess_type": "self0"}),
])
def test_chain_kernel_ncc_esm_parity(rng, key, am, kw):
    """NCC gradient / self-Hessian and ESM mean-Jacobian kernel modes
    match the generic XLA path (interpret mode; bf16-window tolerance)."""
    frame = _scene2(rng)
    f2 = jnp.roll(frame, (3, 2), (0, 1))
    c0 = _one_update_corners(key, am, False, frame, f2, **kw)
    c1 = _one_update_corners(key, am, True, frame, f2, **kw)
    assert np.abs(c0 - c1).max() < 0.05, (key, am, kw)


def test_chain_kernel_mc_parity(rng):
    """Multi-channel SSD rides the chain kernel (channel-stacked window)
    and matches the XLA dense path."""
    frame = _scene2(rng, ch=3)
    f2 = jnp.roll(frame, (3, 2), (0, 1))
    c0 = _one_update_corners("fclk", "mcssd", False, frame, f2)
    c1 = _one_update_corners("fclk", "mcssd", True, frame, f2)
    assert np.abs(c0 - c1).max() < 0.05


def test_chain_kernel_mc_coarse_parity(rng):
    """r5 session 2: MC coarse packs (blurred (n, C) templates +
    channel-expanded Jacobian rows) — kernel and generic paths agree
    under the coarse schedule."""
    frame = _scene2(rng, ch=3)
    f2 = jnp.roll(frame, (3, 2), (0, 1))
    kw = {"coarse_pt_iters": ((4, 4), (2, 3))}
    c0 = _one_update_corners("fclk", "mcssd", False, frame, f2, **kw)
    c1 = _one_update_corners("fclk", "mcssd", True, frame, f2, **kw)
    assert np.abs(c0 - c1).max() < 0.05


def test_chain_kernel_ncc_large_n(rng):
    """Moment-form NCC tiles past the old 4096-point single-tile gate
    (resx 70 -> 4900 points) and still matches the XLA path."""
    frame = _scene2(rng)
    f2 = jnp.roll(frame, (2, 1), (0, 1))
    corners = jnp.asarray([[110, 80], [210, 80], [210, 160], [110, 160]],
                          jnp.float32)
    cs = {}
    for up in (False, True):
        trk = create_tracker("esm", "ncc", "8", resx=70, resy=70,
                             max_iters=5, epsilon=0.0, interp="linear_mm",
                             crop=144, use_pallas=up)
        st = trk.initialize(frame, corners)
        if up:
            assert trk._fused_ok(st, frame)
        st = jax.jit(trk.update)(st, f2)
        cs[up] = np.asarray(trk.corners(st))
    assert np.abs(cs[False] - cs[True]).max() < 0.05


def test_grid_flow_fused_parity(rng):
    """The fused grid-flow kernel (whole joint-iteration loop in-kernel)
    matches the XLA per-iteration path through a full GridTracker
    update, including decimated coarse levels."""
    frame = _scene2(rng)
    f2 = jnp.roll(frame, (3, 2), (0, 1))
    corners = jnp.asarray([[110, 80], [210, 80], [210, 160], [110, 160]],
                          jnp.float32)
    cs = {}
    for up in (False, True):
        trk = create_tracker("grid", "ssd", "8", resx=50, resy=50,
                             interp="linear_mm", crop=160,
                             grid_sub_iters=(1, 8), grid_coarse_stride=2,
                             use_pallas=up)
        st = trk.initialize(frame, corners)
        st = jax.jit(trk.update)(st, f2)
        cs[up] = np.asarray(trk.corners(st))
    assert np.abs(cs[False] - cs[True]).max() < 0.1


def test_grid_flow_banded_random_layout(rng):
    """The banded grid kernel stays FINITE and bounded on a non-slab
    (random-center) point layout: out-of-band points are masked out of
    the stats and solve instead of sampling band-edge garbage (r5
    session 2; the compiled CI lane caught the unmasked version
    exploding through the ZNCC 1/sd amplification)."""
    from mtf_tpu.ops.pallas.grid_flow import grid_flow_fused
    img = np.asarray(_scene2(rng, 160, 160))
    win = jnp.asarray(img, jnp.float32)
    P, n = 100, 64
    side = int(np.sqrt(n))
    ctr = rng.uniform(30, 130, (P, 2))
    off = np.stack(np.meshgrid(np.linspace(-4, 4, side),
                               np.linspace(-4, 4, side)),
                   -1).reshape(-1, 2)
    pts = jnp.asarray((ctr[:, None] + off[None]).reshape(-1, 2).T,
                      jnp.float32)
    t = jnp.asarray([img[int(np.clip(y, 0, 159)), int(np.clip(x, 0, 159))]
                     for x, y in np.asarray(pts).T], jnp.float32)
    d = np.asarray(grid_flow_fused(win, pts, t, jnp.float32(50.0), n, 4,
                                   True, interpret=True))
    assert np.isfinite(d).all()
    assert np.abs(d).max() < 50.0, np.abs(d).max()


def test_lm_coarse_phases_converge(rng):
    """coarse_pt_iters under LM (phase-consistent f): accuracy within
    1.5x of the flat schedule on an exact-GT sequence."""
    img = _scene2(rng)
    corners0 = np.array([[110, 80], [210, 80], [210, 160], [110, 160]],
                        np.float32)

    def acc(**kw):
        trk = create_tracker("eslm", "ncc", "8", resx=50, resy=50,
                             max_iters=10, interp="linear_mm", crop=144,
                             **kw)
        frames, gt = synth.synthetic_sequence(
            img, corners0, trk.ssm, n_frames=5, sigma_scale=0.02, seed=3)
        st = trk.initialize(frames[0], jnp.asarray(gt[0]))
        errs = []
        for i in range(1, len(frames)):
            st = trk.update(st, frames[i])
            c = np.asarray(trk.corners(st)).T
            errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
        return np.mean(errs)

    flat = acc()
    coarse = acc(coarse_pt_iters=((4, 4), (2, 3)))
    assert coarse < max(1.5 * flat, flat + 0.05), (flat, coarse)


def test_pf_rescore_top_k(rng):
    """Hierarchical PF scoring (coarse rank -> top-K full-res rescore)
    tracks an exact-GT sequence within the stride-2 budget."""
    img = _scene2(rng)
    corners0 = np.array([[110, 80], [210, 80], [210, 160], [110, 160]],
                        np.float32)

    def acc(**kw):
        trk = create_tracker("pffc", "ssim", "8", resx=25, resy=25,
                             pf_n_particles=300, enable_lm=True,
                             max_iters=10, interp="linear_mm", crop=256,
                             **kw)
        frames, gt = synth.synthetic_sequence(
            img, corners0, trk.ssm, n_frames=4, sigma_scale=0.005, seed=3)
        st = trk.initialize(frames[0], jnp.asarray(gt[0]))
        errs = []
        for i in range(1, len(frames)):
            st = trk.update(st, frames[i])
            c = np.asarray(trk.corners(st)).T
            errs.append(float(np.mean(np.linalg.norm(c - gt[i], axis=-1))))
        return np.mean(errs)

    hier = acc(pf_score_stride=4, pf_score_blur=True, pf_rescore_top_k=32)
    assert hier < 1.0, hier
    # r5 session 2: downsampled coarse window + tight rescore window —
    # accuracy within the same budget (the 5-seed eval read identical
    # means, log/ab_pf_r5b.log; this is the fast regression gate)
    ds = acc(pf_score_stride=4, pf_score_blur=True, pf_rescore_top_k=32,
             pf_score_downsample=True, pf_rescore_crop=160)
    assert ds < 1.0, ds


def test_pf_score_downsample_needs_blur():
    """score_downsample without the anti-alias blur (or without a
    stride) is a configuration error at construction."""
    with pytest.raises(ValueError, match="score_downsample"):
        create_tracker("pf", "ssd", "2", pf_score_stride=4,
                       pf_score_downsample=True)
    with pytest.raises(ValueError, match="score_downsample"):
        create_tracker("pf", "ssd", "2", pf_score_blur=True,
                       pf_score_downsample=True)


def test_pf_rescore_sharded_rejected():
    """ShardedPF refuses rescore_top_k at construction (global top-k)."""
    from mtf_tpu.am import get_am
    from mtf_tpu.parallel import make_mesh
    from mtf_tpu.parallel.pf_shard import ShardedPF
    from mtf_tpu.sm.pf import PFParams
    from mtf_tpu.ssm import get_ssm

    mesh = make_mesh({"particle": 2})
    with pytest.raises(ValueError, match="rescore_top_k"):
        ShardedPF(get_am("ssd"), get_ssm("2"),
                  pf=PFParams(n_particles=64, score_stride=2,
                              rescore_top_k=8),
                  mesh=mesh, axis="particle")


def test_goturn_analog_key():
    """gtrn/goturn resolve to the weight-free RegNet analog."""
    trk = create_tracker("goturn", "ssd", "4", rg_n_samples=200,
                         rg_train_steps=30)
    assert type(trk).__name__ == "RegNet"
    assert trk.ssm.dof == 4
