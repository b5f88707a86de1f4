"""Native TLD: tracking, occlusion invalidation, re-acquisition
(reference ThirdParty/TLD — TLD.cc / DetectorCascade.cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene():
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(3)
    img = gaussian_filter(rng.standard_normal((160, 200)), 2.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return np.asarray(img, np.float32)


C0 = np.array([[60, 50], [110, 50], [110, 100], [60, 100]], np.float32)
CENTER0 = np.array([85.0, 75.0])


def _shift(im, dx, dy):
    return np.roll(np.roll(im, dy, axis=0), dx, axis=1)


def _make():
    from mtf_tpu import create_tracker
    return create_tracker("tld", tld_canon_h=96, tld_canon_w=128,
                          tld_levels=3)


def test_tld_constructs_and_tracks(scene):
    trk = _make()
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    assert st.fern_pos.shape == (10, 2 ** 13)
    assert float(jnp.sum(st.pos_valid)) >= 1.0
    assert float(jnp.sum(st.neg_valid)) >= 1.0  # seeded negatives
    upd = jax.jit(trk.update)
    for t, (dx, dy) in enumerate([(2, 1), (4, 2), (6, 3)]):
        st = upd(st, jnp.asarray(_shift(scene, dx, dy)))
        err = np.linalg.norm(np.asarray(st.center) - (CENTER0 + [dx, dy]))
        assert err < 4.0, (t, err)
    assert bool(st.valid)


def test_tld_occlusion_invalidates_and_reacquires(scene):
    """The TLD signature behavior: full occlusion drops the validity
    flag (learning stops — no model poisoning), and when the target
    reappears the detection cascade re-acquires it."""
    trk = _make()
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    upd = jax.jit(trk.update)
    rng = np.random.default_rng(9)
    traj = [(2, 1), (4, 2), (6, 3)] + [(8, 4)] * 6 + [(10, 5), (12, 6)]
    valids = []
    errs = []
    for t, (dx, dy) in enumerate(traj):
        f = _shift(scene, dx, dy)
        true_c = CENTER0 + [dx, dy]
        if 3 <= t <= 7:  # fully occlude the target for 5 frames
            x0, y0 = int(true_c[0] - 35), int(true_c[1] - 35)
            h = min(70, 160 - max(0, y0))
            w = min(70, 200 - max(0, x0))
            f = f.copy()
            f[max(0, y0):max(0, y0) + h, max(0, x0):max(0, x0) + w] = \
                128.0 + 20 * rng.standard_normal((h, w))
        st = upd(st, jnp.asarray(f))
        valids.append(bool(st.valid))
        errs.append(float(np.linalg.norm(np.asarray(st.center) - true_c)))
    # invalid during occlusion (no learning on the occluder)...
    assert not all(valids[3:8]), valids
    # ...and re-acquired afterwards: validity returns
    assert any(valids[8:]), (valids, errs)
    assert errs[-1] < 12.0, errs


def test_tld_fern_posteriors_learn(scene):
    trk = _make()
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    # initial training populated both count tables
    assert float(jnp.sum(st.fern_pos)) > 0
    assert float(jnp.sum(st.fern_neg)) > 0
    st2 = jax.jit(trk.update)(st, jnp.asarray(_shift(scene, 2, 1)))
    # P/N experts keep accumulating while valid
    assert float(jnp.sum(st2.fern_pos)) >= float(jnp.sum(st.fern_pos))


def test_tld_set_region_and_corners(scene):
    trk = _make()
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    c = np.asarray(trk.corners(st))
    assert c.shape == (2, 4)
    np.testing.assert_allclose(c.T, C0, atol=1e-4)
    c2 = C0 + 10.0
    st2 = trk.set_region(st, jnp.asarray(c2), jnp.asarray(scene))
    np.testing.assert_allclose(np.asarray(trk.corners(st2)).T, c2,
                               atol=1e-3)
