"""Native input pipeline + pyMTF2 streaming API tests
(TrackerStrct_mt.h / pyMTF2.cc surface)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    """Small on-disk JPEG sequence with GT."""
    import jax.numpy as jnp

    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils import synth
    from mtf_tpu.utils.gt import write_corners_file

    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    raw = np.cumsum(np.cumsum(rng.normal(0, 1, (240, 320)), 0), 1)
    img = jnp.asarray(
        (raw - raw.min()) / (raw.max() - raw.min()) * 255.0, jnp.float32)
    corners0 = np.asarray([[110, 70], [210, 70], [210, 170], [110, 170]],
                          np.float32)
    frames, gt = synth.synthetic_sequence(img, corners0, get_ssm("8"),
                                          n_frames=6, sigma_scale=0.015)
    import cv2
    for i, f in enumerate(np.asarray(frames)):
        cv2.imwrite(str(d / f"frame{i + 1:05d}.jpg"),
                    np.clip(f, 0, 255).astype(np.uint8))
    write_corners_file(str(d / "gt.txt"), gt)
    return str(d)


def test_native_input_matches_python(seq_dir):
    from mtf_tpu.utils.input import get_input
    from mtf_tpu.utils.native_input import NativeInput, native_available
    if not native_available():
        pytest.skip("native framepipe not built")
    nat = list(NativeInput(seq_dir))
    py = [np.asarray(f, np.float32) for f in get_input(seq_dir)]
    assert len(nat) == len(py) == 6
    for a, b in zip(nat, py):
        assert np.allclose(a, b.squeeze(), atol=1.0)


def test_native_input_in_order(seq_dir):
    from mtf_tpu.utils.native_input import NativeInput, native_available
    if not native_available():
        pytest.skip("native framepipe not built")
    # multiple decode threads must still emit frames in order
    src = NativeInput(seq_dir, buffer_size=2, n_threads=4)
    frames = list(src)
    assert len(frames) == 6
    src.close()


def test_pymtf2_streaming_tracks(seq_dir):
    import mtf_tpu.api2 as pymtf2
    from mtf_tpu.utils.gt import read_corners_file

    gt = read_corners_file(os.path.join(seq_dir, "gt.txt"))
    assert pymtf2.init(seq_dir)
    tid = pymtf2.createTracker(gt[0], sm="esm", am="ncc", ssm="8",
                               resx=32, resy=32)
    i, errs = 1, []
    while pymtf2.step():
        errs.append(np.linalg.norm(pymtf2.getRegion(tid).T - gt[i],
                                   axis=-1).mean())
        i += 1
    pymtf2.quit()
    assert not pymtf2.isInitialized()
    assert len(errs) == 5
    assert max(errs) < 2.0


def test_native_preproc_in_workers(seq_dir):
    """fp_open2: the host-side filter chain (pipeline.h:178-247) runs
    inside the native decode workers; gauss matches cv2 exactly."""
    import cv2
    import numpy as np

    from mtf_tpu.utils.native_input import NativeInput, native_available
    if not native_available():
        import pytest
        pytest.skip("native framepipe not built")
    ni = NativeInput(seq_dir, preproc="gauss", pp1=5, pp2=1.5)
    f0 = next(iter(ni))
    ni.close()
    import glob
    first = sorted(glob.glob(f"{seq_dir}/*.jpg"))[0]
    ref = cv2.GaussianBlur(cv2.imread(first, cv2.IMREAD_UNCHANGED),
                           (5, 5), 1.5).astype(np.float32)
    assert np.abs(f0 - ref).max() < 1e-3
