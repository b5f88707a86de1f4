"""Config-layer parity: sigma.cfg presets + multi.cfg blocks
(reference Config/sigma.cfg, Config/multi.cfg, parameters.h:4029-4281)."""
import numpy as np

from mtf_tpu import create_tracker
from mtf_tpu.factory import create_trackers_from_multi
from mtf_tpu.utils.config import (parse_cfg_text, read_multi_cfg,
                                  resolve_sigma_presets)

SIGMA_CFG = """
# homography presets
00:ssm_sigma\t0.015,0.01,0,0,0,0,0,0
01:ssm_sigma\t0.03,0.02,0,0,0,0,0,0
19:ssm_sigma\t1
"""

MULTI_CFG = """
# Tracker 1
mtf_sm\tfclk
mtf_am\tssd
mtf_ssm\t2

# Tracker 2
mtf_sm\tesm
mtf_am\tncc
mtf_ssm\t8
max_iters\t12
"""


def test_sigma_presets_parse_and_resolve():
    cfg = parse_cfg_text(SIGMA_CFG)
    assert "_presets" in cfg
    vecs = resolve_sigma_presets(cfg, [0, 1])
    assert vecs[0][:2] == [0.015, 0.01]
    assert vecs[1][:2] == [0.03, 0.02]
    assert resolve_sigma_presets(cfg, 19) == [[1]]


def test_sigma_ids_feed_pf_sampler():
    cfg = parse_cfg_text(SIGMA_CFG)
    trk = create_tracker("pf100", "ssd", "8",
                         pf_ssm_sigma_ids=[1], **{"_presets":
                                                  cfg["_presets"]})
    assert tuple(trk.pf.ssm_sigma)[:2] == (0.03, 0.02)


def test_multi_cfg_blocks():
    blocks = read_multi_cfg(MULTI_CFG)
    assert len(blocks) == 2
    assert blocks[0]["sm"] == "fclk" and blocks[1]["sm"] == "esm"
    assert blocks[1]["max_iters"] == 12


def test_multi_cfg_builds_trackers():
    trackers = create_trackers_from_multi(MULTI_CFG, resx=16, resy=16)
    assert len(trackers) == 2
    assert trackers[0].ssm.dof == 2
    assert trackers[1].ssm.dof == 8
    assert trackers[1].prm.max_iters == 12


def test_cascade_from_multi_cfg(test_image):
    import jax.numpy as jnp
    trk = create_tracker("casc", "ssd", "8", multi_cfg=MULTI_CFG,
                         resx=16, resy=16)
    corners = jnp.asarray([[40, 40], [100, 40], [100, 100], [40, 100]],
                          jnp.float32)
    st = trk.initialize(jnp.asarray(test_image), corners)
    st = trk.update(st, jnp.asarray(test_image))
    assert np.isfinite(np.asarray(trk.corners(st))).all()
