"""Checkpoint/resume + profiling utils (SURVEY.md §5.1/§5.4)."""
import numpy as np
import jax.numpy as jnp

from mtf_tpu import create_tracker
from mtf_tpu.utils import synth
from mtf_tpu.utils.checkpoint import load_state, save_state
from mtf_tpu.utils.profiling import Profiler


def test_save_load_roundtrip(test_image, tmp_path):
    sm = create_tracker("esm", "ncc", "8", resx=16, resy=16)
    corners = jnp.asarray([[40, 40], [100, 40], [100, 100], [40, 100]],
                          jnp.float32)
    st = sm.initialize(jnp.asarray(test_image), corners)
    Wm = jnp.array([[1, 0, 1.0], [0, 1, 0.5], [0, 0, 1]], jnp.float32)
    frame1 = synth.warp_image(jnp.asarray(test_image), Wm)
    st = sm.update(st, frame1)

    p = str(tmp_path / "trk.npz")
    save_state(p, st)
    st2 = load_state(p, sm.initialize(jnp.asarray(test_image), corners))
    np.testing.assert_allclose(np.asarray(sm.corners(st)),
                               np.asarray(sm.corners(st2)))
    # resumed state keeps tracking
    st3 = sm.update(st2, frame1)
    assert np.isfinite(np.asarray(sm.corners(st3))).all()


def test_pf_state_roundtrip(test_image, tmp_path):
    sm = create_tracker("pf100", "ssd", "2", resx=12, resy=12)
    corners = jnp.asarray([[40, 40], [100, 40], [100, 100], [40, 100]],
                          jnp.float32)
    st = sm.initialize(jnp.asarray(test_image), corners)
    st = sm.update(st, jnp.asarray(test_image))
    p = str(tmp_path / "pf.npz")
    save_state(p, st)
    st2 = load_state(p, sm.initialize(jnp.asarray(test_image), corners))
    np.testing.assert_allclose(np.asarray(st.extra.particles),
                               np.asarray(st2.extra.particles))


def test_profiler_artifact(tmp_path):
    prof = Profiler()
    prof.init_timer()
    with prof.section("stage_a"):
        sum(range(1000))
    prof.record_event("stage_b")
    s = prof.summary()
    assert "stage_a" in s and "stage_b" in s
    out = prof.write(str(tmp_path / "times.txt"))
    text = open(out).read()
    assert "stage_a" in text and "mean=" in text
