"""Native CMT (reference ThirdParty/CMT/CMT.cpp semantics): keypoint
consensus tracking with scale/rotation voting and partial-occlusion
robustness."""
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(1)
    img = np.kron(rng.uniform(0, 255, (40, 50)),
                  np.ones((8, 8))).astype(np.float32)
    img += rng.normal(0, 5, img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


C0 = np.array([[120, 100], [220, 100], [220, 180], [120, 180]], np.float32)
CENTER0 = np.array([170.0, 140.0])


def _shift(im, dx, dy):
    return np.roll(np.roll(im, dy, axis=0), dx, axis=1)


def test_cmt_tracks_translation(scene):
    from mtf_tpu import create_tracker
    trk = create_tracker("cmt")
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    assert float(jnp.sum(st.kp_valid)) >= 10
    for dx, dy in [(3, 2), (6, 4), (9, 6), (12, 8)]:
        st = trk.update(st, jnp.asarray(_shift(scene, dx, dy)))
        err = np.linalg.norm(np.asarray(st.center) - (CENTER0 + [dx, dy]))
        assert err < 2.0, (dx, dy, err)
    c = np.asarray(trk.corners(st))
    assert c.shape == (2, 4)


def test_cmt_scale_consensus(scene):
    """Pairwise-median scale voting follows a zoom sequence
    (Consensus::estimateScaleRotation semantics)."""
    import scipy.ndimage as ndi
    from mtf_tpu import create_tracker

    def zoom_frame(base, z):
        zz = ndi.zoom(base, z, order=1)
        cy, cx = int(CENTER0[1] * z), int(CENTER0[0] * z)
        out = np.zeros_like(base)
        h, w = base.shape
        patch = zz[max(0, cy - 140):max(0, cy - 140) + h,
                   max(0, cx - 170):max(0, cx - 170) + w]
        out[:patch.shape[0], :patch.shape[1]] = patch
        return out

    trk = create_tracker("cmt")
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    for z in (1.03, 1.06, 1.09, 1.12):
        st = trk.update(st, jnp.asarray(zoom_frame(scene, z)))
        assert abs(float(st.scale) - z) < 0.03, (z, float(st.scale))


def test_cmt_partial_occlusion(scene):
    """Half the target covered: the surviving keypoints' consensus still
    localizes the center (the CMT selling point)."""
    from mtf_tpu import create_tracker
    trk = create_tracker("cmt")
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    f = _shift(scene, 4, 2).copy()
    # cover the left half of the (shifted) target
    f[100:185, 120:175] = 64.0
    st = trk.update(st, jnp.asarray(f))
    err = np.linalg.norm(np.asarray(st.center) - (CENTER0 + [4, 2]))
    assert err < 6.0, err


def test_cmt_device_stage_is_jittable(scene):
    """update_with_detections (the pure device stage) jits."""
    import jax
    from mtf_tpu import create_tracker
    trk = create_tracker("cmt")
    st = trk.initialize(jnp.asarray(scene), jnp.asarray(C0))
    pts, desc = trk._detect(scene)
    N = trk.prm.max_keypoints + trk.prm.max_bg
    pt_p, pt_v = trk._pad(pts, N, 2)
    de_p, _ = trk._pad(desc, N, st.kp_desc.shape[1])
    fn = jax.jit(trk.update_with_detections)
    st2 = fn(st, pt_p, de_p, pt_v, jnp.asarray(scene))
    assert np.all(np.isfinite(np.asarray(st2.center)))
