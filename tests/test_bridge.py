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
