"""Harness-layer tests: config, GT I/O, metrics, preproc, datasets."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu.utils import metrics
from mtf_tpu.utils.config import parse_arg_pairs, parse_cfg_text, read_params
from mtf_tpu.utils.datasets import ACTORS, sequence_names
from mtf_tpu.utils.gt import read_corners_file, write_corners_file
from mtf_tpu.utils.preproc import PREPROC_REGISTRY, get_preproc


def test_cfg_parsing():
    cfg = parse_cfg_text("""
# a comment
mtf_sm fclk
mtf_am ncc
mtf_res 40
epsilon 0.01
enable_lm true
pf_ssm_sigma 0.1,0.2,0.3
#disabled_key 5
""")
    assert cfg["mtf_sm"] == "fclk"
    assert cfg["mtf_res"] == 40
    assert cfg["epsilon"] == 0.01
    assert cfg["enable_lm"] is True
    assert cfg["pf_ssm_sigma"] == [0.1, 0.2, 0.3]
    assert "disabled_key" not in cfg


def test_cli_pairs_and_postprocess(tmp_path):
    (tmp_path / "mtf.cfg").write_text("mtf_sm esm\nmtf_res 30\n")
    cfg = read_params(str(tmp_path), ["mtf_am", "mi", "resy", "25"])
    assert cfg["sm"] == "esm" and cfg["am"] == "mi"
    assert cfg["resx"] == 30 and cfg["resy"] == 25  # CLI wins


def test_gt_roundtrip(tmp_path):
    corners = np.random.default_rng(0).uniform(0, 100, (5, 4, 2)).astype(
        np.float32)
    path = str(tmp_path / "seq.txt")
    write_corners_file(path, corners)
    back = read_corners_file(path)
    np.testing.assert_allclose(back, corners, atol=1e-3)
    with open(path) as f:
        assert f.readline().startswith("frame ulx uly")


def test_metrics():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    assert metrics.mcd_error(sq, sq) == 0.0
    assert metrics.cl_error(sq, sq + 3.0) == pytest.approx(np.hypot(3, 3))
    # Jaccard of identical quads = 0; half-overlap known value
    assert metrics.jaccard_error(sq, sq) == pytest.approx(0.0, abs=1e-6)
    shifted = sq + np.array([5.0, 0.0], np.float32)
    # overlap 50, union 150 -> 1 - 1/3
    assert metrics.jaccard_error(sq, shifted) == pytest.approx(2 / 3, abs=1e-6)
    # disjoint
    assert metrics.jaccard_error(sq, sq + 100.0) == 1.0


def test_success_rate():
    errs = np.array([0.5, 1.5, 25.0])
    th, sr, mean_sr = metrics.success_rate_curve(errs, n_thresh=10)
    assert sr[0] == 0.0 or sr[0] == pytest.approx(1 / 3)
    assert sr[-1] == pytest.approx(2 / 3)
    assert 0 < mean_sr < 1


def test_preproc_registry(test_image):
    img = jnp.asarray(test_image)
    for key in PREPROC_REGISTRY:
        out = get_preproc(key)(img)
        assert out.shape[:2] == img.shape[:2], key
        assert bool(jnp.all(jnp.isfinite(out))), key
    rgb = jnp.stack([img] * 3, axis=-1)
    assert get_preproc("none")(rgb).shape == img.shape


def test_dataset_registry():
    assert len(sequence_names("TMT")) == 109
    assert len(sequence_names("UCSB")) == 96
    assert sequence_names("TMT")[3] == "nl_cereal_s3"  # headline sequence
    assert sequence_names("LinTrack") == ["mouse_pad", "phone", "towel"]
    assert "VOT" in ACTORS and "Synthetic" in ACTORS
    with pytest.raises(ValueError):
        sequence_names("nope")


def test_run_mtf_cli(tmp_path):
    from mtf_tpu.apps.run_mtf import main
    fps, err = main(["--synthetic", "--n_frames", "6", "--platform", "cpu",
                     "--out_dir", str(tmp_path), "--write_outputs",
                     "sm", "fclk", "am", "ssd", "ssm", "2",
                     "resx", "16", "resy", "16"])
    assert err < 0.5
    assert os.path.exists(tmp_path / "tracking_stats.txt")
    assert os.path.exists(tmp_path / "synthetic_fclk_ssd_2.sr")


def test_dataset_registry_all_actors():
    """All 18 reference actors (datasets.h:867-929) with exact counts."""
    from mtf_tpu.utils.datasets import ACTORS, SEQUENCES

    expected = {
        "TMT": 109, "UCSB": 96, "LinTrack": 3, "LinTrackShort": 14,
        "PAMI": 28, "TMT_FINE": 24, "PTW": 210, "METAIO": 40, "CMT": 20,
        "VOT": 25, "VOT16": 60, "VTB": 100, "VIVID": 9, "TrakMark": 21,
        "Mosaic": 17, "Misc": 5, "Synthetic": 25, "Live": 0,
    }
    assert set(ACTORS) == set(expected)
    for actor, n in expected.items():
        assert len(SEQUENCES[actor]) == n, actor


def test_opt_gt_projection():
    """optimize_gt projects 8-DOF GT onto a lower-DOF SSM manifold
    (objUtils.cc:948-950 OptGT protocol)."""
    import jax.numpy as jnp

    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils.gt import optimize_gt

    rng = np.random.default_rng(0)
    base = np.array([[10, 10], [60, 10], [60, 50], [10, 50]], np.float32)
    # GT that is exactly a similitude of frame 0, plus noise
    gt = []
    ssm_sim = get_ssm("sim")
    for t in range(5):
        s = jnp.asarray([t * 2.0, t * 1.0, 0.01 * t, 0.02 * t], jnp.float32)
        gt.append(np.asarray(ssm_sim.warp_pts(s, jnp.asarray(base))))
    gt = np.stack(gt)
    opt = optimize_gt(gt + rng.normal(0, 0.05, gt.shape).astype(np.float32),
                      get_ssm("sim"))
    assert opt.shape == gt.shape
    # projection recovers the underlying similitude motion to ~noise level
    assert np.abs(opt - gt).max() < 0.3
    # trans(2-DOF) projection keeps the frame-0 shape rigid
    opt2 = optimize_gt(gt, get_ssm("trans"))
    d0 = gt[0] - gt[0].mean(0)
    for t in range(5):
        assert np.abs((opt2[t] - opt2[t].mean(0)) - d0).max() < 1e-3


def test_reinit_gt_binary_roundtrip(tmp_path):
    """Triangular ReinitGT binary layout (objUtils.cc:1025-1066)."""
    from mtf_tpu.utils.gt import read_reinit_gt, write_reinit_gt

    rng = np.random.default_rng(1)
    T = 7
    gt = rng.normal(0, 50, (T, 4, 2)).astype(np.float64)
    path = str(tmp_path / "seq.bin")
    write_reinit_gt(path, gt)
    # expected reference file size: T*(T+1)*4 doubles + one int
    assert os.path.getsize(path) == T * (T + 1) * 4 * 8 + 4
    for r in (0, 3, T - 1):
        out = read_reinit_gt(path, r)
        assert out.shape == (T - r, 4, 2)
        np.testing.assert_allclose(out, gt[r:], rtol=1e-6)
    # callable form: per-start re-optimized GT
    write_reinit_gt(path, lambda r: gt[r:] + r)
    np.testing.assert_allclose(read_reinit_gt(path, 2), gt[2:] + 2,
                               rtol=1e-6)


def test_run_mtf_multi_object_fleet(tmp_path):
    """--n_objs: N objects tracked in one vmapped fleet update."""
    from mtf_tpu.apps.run_mtf import main

    fps, err = main(["--synthetic", "--n_frames", "6", "--platform", "cpu",
                     "--n_objs", "4", "--write_outputs",
                     "--out_dir", str(tmp_path),
                     "sm", "fclk", "am", "ssd", "ssm", "2",
                     "resx", "16", "resy", "16"])
    assert err < 0.5
    for i in range(4):
        assert os.path.exists(tmp_path / f"synthetic_fclk_ssd_2_obj{i}.txt")


def test_run_mtf_multi_cfg(tmp_path):
    """--multi: one run per multi.cfg tracker block (comparison mode)."""
    from mtf_tpu.apps.run_mtf import main

    mcfg = tmp_path / "multi.cfg"
    mcfg.write_text("sm fclk\nam ssd\n\nsm iclk\nam zncc\n")
    out = main(["--synthetic", "--n_frames", "5", "--platform", "cpu",
                "--multi", str(mcfg), "ssm", "2", "resx", "16", "resy", "16"])
    assert len(out) == 2
    for fps, err in out:
        assert err < 0.5


def test_viz_annotate_and_record(tmp_path):
    """Region drawing + annotated tracking video (runMTF.cc:607-674)."""
    import cv2

    from mtf_tpu.utils.viz import VideoRecorder, annotate

    frame = np.random.default_rng(0).uniform(0, 255, (60, 80)).astype(
        np.float32)
    corners = np.asarray([[10, 10], [50, 10], [50, 40], [10, 40]],
                         np.float32)
    canvas = annotate(frame, corners, labels=["trk"], gt=corners + 2)
    assert canvas.shape == (60, 80, 3) and canvas.dtype == np.uint8
    # the polygon actually painted pixels
    assert (canvas[10, 10:50, 2] == 255).any()
    path = str(tmp_path / "out.avi")
    rec = VideoRecorder(path, fps=10)
    for _ in range(3):
        rec.write(canvas)
    rec.close()
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_chol_solve_small_matches_numpy():
    """Scalar-register unrolled Cholesky == numpy solve (SPD systems),
    unbatched and vmapped."""
    import jax
    import jax.numpy as jnp

    from mtf_tpu.ops.linalg import chol_solve_small, neg_def_solve

    rng = np.random.default_rng(0)
    for S in (2, 3, 8, 14):
        M = rng.normal(0, 1, (S, S))
        A = (M @ M.T + S * np.eye(S)).astype(np.float32)
        b = rng.normal(0, 1, S).astype(np.float32)
        x = np.asarray(chol_solve_small(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b),
                                   rtol=2e-4, atol=2e-4)
        xn = np.asarray(neg_def_solve(jnp.asarray(-A), jnp.asarray(b)))
        np.testing.assert_allclose(xn, np.linalg.solve(A, b),
                                   rtol=2e-4, atol=2e-4)
    # batched via vmap
    Ms = rng.normal(0, 1, (5, 8, 8))
    As = (Ms @ np.transpose(Ms, (0, 2, 1))
          + 8 * np.eye(8)).astype(np.float32)
    bs = rng.normal(0, 1, (5, 8)).astype(np.float32)
    xs = np.asarray(jax.vmap(chol_solve_small)(jnp.asarray(As),
                                               jnp.asarray(bs)))
    np.testing.assert_allclose(
        xs, np.linalg.solve(As, bs[..., None])[..., 0],
        rtol=2e-4, atol=2e-4)


def test_chol_solve_blocked_high_dof():
    """Blocked Cholesky (Spline/TPS-DOF solves, VERDICT r4 #9): matches
    the LAPACK solve it replaces, vmaps, and emits NO triangular-solve /
    LU custom call in its jaxpr."""
    import jax
    import jax.numpy as jnp
    from mtf_tpu.ops.linalg import chol_solve_blocked, chol_solve_small

    rng = np.random.default_rng(3)
    for S in (13, 20, 50):
        M = rng.normal(0, 1, (S, S))
        A = jnp.asarray(M @ M.T + S * np.eye(S), jnp.float32)
        b = jnp.asarray(rng.normal(0, 1, (S,)), jnp.float32)
        x = np.asarray(chol_solve_blocked(A, b))
        xr = np.asarray(jnp.linalg.solve(A, b))
        assert np.max(np.abs(x - xr)) / np.max(np.abs(xr)) < 1e-4, S
        # chol_solve_small must route S>12 to the blocked form
        xs = np.asarray(chol_solve_small(A, b))
        np.testing.assert_allclose(xs, x, rtol=1e-6, atol=1e-6)
    # batched
    Ms = rng.normal(0, 1, (4, 50, 50))
    As = jnp.asarray(np.einsum("bij,bkj->bik", Ms, Ms) + 50 * np.eye(50),
                     jnp.float32)
    bs = jnp.asarray(rng.normal(0, 1, (4, 50)), jnp.float32)
    xs = np.asarray(jax.vmap(chol_solve_blocked)(As, bs))
    xr = np.asarray(jax.vmap(jnp.linalg.solve)(As, bs))
    assert np.max(np.abs(xs - xr)) < 1e-4
    # HLO hygiene: no LAPACK-style factorization primitive anywhere
    jaxpr = jax.make_jaxpr(chol_solve_small)(As[0], bs[0])
    prims = {e.primitive.name for e in jaxpr.jaxpr.eqns}
    assert not prims & {"lu", "triangular_solve", "cholesky",
                        "custom_linear_solve"}, prims
