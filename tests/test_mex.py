"""mexMTF2 command-string front-end tests (mexMTF2.cc:24-35 surface)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    import jax.numpy as jnp

    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils import synth

    d = tmp_path_factory.mktemp("mexseq")
    rng = np.random.default_rng(0)
    raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
    img = jnp.asarray(
        (raw - raw.min()) / (raw.max() - raw.min()) * 255.0, jnp.float32)
    corners0 = np.asarray([[110, 70], [210, 70], [210, 170], [110, 170]],
                          np.float32)
    frames, _ = synth.synthetic_sequence(img, corners0, get_ssm("8"),
                                         n_frames=5, sigma_scale=0.01)
    import cv2
    for i, f in enumerate(np.asarray(frames)):
        cv2.imwrite(str(d / f"frame{i + 1:05d}.jpg"),
                    np.clip(f, 0, 255).astype(np.uint8))
    return str(d)


def test_mex_command_roundtrip(seq_dir):
    from mtf_tpu.api_mex import mex

    assert mex("init", seq_dir) == (True,)
    assert mex("is_initialized") == (True,)
    ok, frame = mex("get_frame")
    assert ok and frame is not None
    h, w = frame.shape[:2]
    c = np.array([[w/2-40, h/2-30], [w/2+40, h/2-30],
                  [w/2+40, h/2+30], [w/2-40, h/2+30]], np.float32)
    ok, tid = mex("create_tracker", c, "sm", "fclk", "am", "ssd", "ssm", "2")
    assert ok
    ok, region = mex("get_region", tid)
    assert ok and np.all(np.isfinite(np.asarray(region)))
    mex("set_region", tid, c)
    assert mex("remove_tracker", tid) == (True,)
    assert mex("quit") == (True,)


def test_mex_invalid_command():
    from mtf_tpu.api_mex import mex
    from mtf_tpu.utils.excp import InvalidArgument

    with pytest.raises(InvalidArgument):
        mex("bogus_command")


def test_mex1_synchronous_surface(seq_dir):
    """mexMTF v1 (mexMTF.cc): caller-driven create/get_region/remove."""
    import cv2

    from mtf_tpu.api_mex import mex1

    frames = []
    for i in range(1, 6):
        frames.append(cv2.imread(f"{seq_dir}/frame{i:05d}.jpg",
                                 cv2.IMREAD_GRAYSCALE).astype(np.float32))
    corners = np.asarray([[110, 70], [210, 70], [210, 170], [110, 170]],
                         np.float32)
    (tid,) = mex1("create", frames[0], corners)
    for f in frames[1:]:
        ok, out = mex1("get_region", f, tid)
        assert ok and out.shape in ((2, 4), (4, 2))
    # region stays near the (slowly moving) target
    c = out.reshape(-1, 2) if out.shape == (4, 2) else out.T
    assert np.abs(c - corners).max() < 20.0
    (ok,) = mex1("set_region", corners, tid)
    assert ok
    (ok,) = mex1("remove", tid)
    assert ok
