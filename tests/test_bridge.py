"""Shared-memory frame bridge (ROS mtf_bridge transport analog)."""
import numpy as np

from mtf_tpu.bridge import SharedImageReader, SharedImageWriter


def test_write_read_roundtrip():
    w = SharedImageWriter("t0", 32, 40, 1, n_slots=3)
    try:
        r = SharedImageReader("t0")
        assert r.read_latest() == (None, None)
        f0 = np.arange(32 * 40, dtype=np.float32).reshape(32, 40, 1)
        assert w.write(f0) == 0
        fid, out = r.read_latest()
        assert fid == 0
        np.testing.assert_array_equal(out, f0)
        # ring overwrite: ids keep increasing, latest wins
        for i in range(5):
            w.write(f0 + i + 1)
        fid, out = r.read_latest()
        assert fid == 5
        np.testing.assert_array_equal(out, f0 + 5)
        r.close()
    finally:
        w.close()


def test_wait_next():
    w = SharedImageWriter("t1", 8, 8, 1)
    try:
        r = SharedImageReader("t1")
        w.write(np.zeros((8, 8, 1), np.float32))
        fid, _ = r.wait_next(timeout=1.0)
        assert fid == 0
        w.write(np.ones((8, 8, 1), np.float32))
        fid, out = r.wait_next(timeout=1.0)
        assert fid == 1 and out.max() == 1.0
        r.close()
    finally:
        w.close()


def test_tracker_node_over_bridge(tmp_path):
    """sample_tracker_node analog: a separate process consumes bridge
    frames, tracks, and publishes JSON-line corners."""
    import json
    import subprocess
    import sys
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtf_tpu.bridge import SharedImageWriter
    from mtf_tpu.ssm import get_ssm
    from mtf_tpu.utils.synth import synthetic_sequence

    rng = np.random.default_rng(0)
    raw = np.cumsum(np.cumsum(rng.normal(0, 1, (120, 160)), 0), 1)
    img = jnp.asarray(
        (raw - raw.min()) / (raw.max() - raw.min()) * 255.0, jnp.float32)
    c0 = np.asarray([[50, 35], [110, 35], [110, 85], [50, 85]], np.float32)
    frames, gt = synthetic_sequence(img, c0, get_ssm("2"), n_frames=5,
                                    sigma_scale=0.01, seed=4)
    frames = np.asarray(frames)

    w = SharedImageWriter("t_node", 120, 160, 1, n_slots=4)
    try:
        w.write(frames[0])
        proc = subprocess.Popen(
            [sys.executable, "-m", "mtf_tpu.apps.tracker_node",
             "--bridge", "t_node", "--platform", "cpu",
             "--corners", ",".join(str(v) for v in c0.reshape(-1)),
             "--n_frames", "4", "--timeout", "60",
             "--out", str(tmp_path / "node.txt"),
             "sm", "fclk", "am", "ssd", "ssm", "2",
             "resx", "16", "resy", "16"],
            stdout=subprocess.PIPE, text=True)
        # readiness handshake, then stream frame-by-frame in lock-step
        ready = json.loads(proc.stdout.readline())
        assert ready["event"] == "initialized"
        lines = []
        for f in frames[1:]:
            w.write(f)
            lines.append(json.loads(proc.stdout.readline()))
        proc.wait(timeout=60)
    finally:
        w.close()
    assert len(lines) == 4
    last = np.asarray(lines[-1]["corners"]).reshape(4, 2)
    # the node stayed on the (slowly moving) target
    assert np.abs(last - c0).max() < 10.0
    assert (tmp_path / "node.txt").exists()
